from gaussiangrasper_tpu.core.transforms import (
    quat_to_rotmat,
    rotmat_to_quat,
    normalize,
    random_quats,
)
from gaussiangrasper_tpu.core.cameras import Camera, view_matrix, projection_matrix
from gaussiangrasper_tpu.core import sh

__all__ = [
    "quat_to_rotmat",
    "rotmat_to_quat",
    "normalize",
    "random_quats",
    "Camera",
    "view_matrix",
    "projection_matrix",
    "sh",
]
