from gaussiangrasper_tpu.models.gaussian_field import (
    GaussianParams,
    init_from_seeds,
    init_random,
)
from gaussiangrasper_tpu.models.model import GaussianSplatConfig, GaussianSplatModel

__all__ = [
    "GaussianParams",
    "init_from_seeds",
    "init_random",
    "GaussianSplatConfig",
    "GaussianSplatModel",
]
