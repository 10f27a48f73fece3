"""TensoRF field: vector-matrix (VM) decomposed radiance grid.

Role of the reference's models/tensorf.py + fields/tensorf_field.py
(TensoRFField with TensorVMEncoding from field_components/encodings.py):
density and appearance live in three axis-aligned plane+line factor pairs
instead of an MLP. TPU-native shape: the plane lookups are bilinear
gathers over (3, R, R, C) arrays and the fused "B @ basis" projection is
a single matmul — both map directly onto HBM gathers + the MXU with no
custom kernel.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from gaussiangrasper_tpu.models.efd import init_mlp, mlp_apply
from gaussiangrasper_tpu.models.encodings import positional_encoding

# plane k sees coordinate pair _PLANE_AXES[k], line k sees _LINE_AXIS[k]
_PLANE_AXES = ((0, 1), (0, 2), (1, 2))
_LINE_AXIS = (2, 1, 0)


def init_tensorf(
    key: jax.Array,
    resolution: int = 128,
    density_components: int = 8,
    appearance_components: int = 24,
    appearance_dim: int = 27,
    hidden: int = 64,
) -> Dict:
    """Factor grids ~ N(0, 0.1) (the reference's 0.1*randn init,
    TensorVMEncoding), basis projection, and the small view-dependent
    color MLP (tensorf_field.py MLPHead)."""
    kd_p, kd_l, ka_p, ka_l, kb, km = jax.random.split(key, 6)
    r, cd, ca = resolution, density_components, appearance_components
    return {
        "density_planes": 0.1 * jax.random.normal(kd_p, (3, r, r, cd)),
        "density_lines": 0.1 * jax.random.normal(kd_l, (3, r, cd)),
        "app_planes": 0.1 * jax.random.normal(ka_p, (3, r, r, ca)),
        "app_lines": 0.1 * jax.random.normal(ka_l, (3, r, ca)),
        # fused per-axis appearance features -> appearance_dim
        "basis": jax.random.normal(kb, (3 * ca, appearance_dim))
        / jnp.sqrt(3.0 * ca),
        # color head: appearance feats + PE(dirs, 2 freqs incl. input)
        "color_mlp": init_mlp(km, appearance_dim + 15, 3, (hidden, hidden)),
    }


def _bilerp_plane(plane: jax.Array, uv: jax.Array) -> jax.Array:
    """plane (R, R, C), uv (..., 2) in [0,1] -> (..., C)."""
    r = plane.shape[0]
    pos = jnp.clip(uv, 0.0, 1.0) * (r - 1)
    p0 = jnp.floor(pos).astype(jnp.int32)
    p0 = jnp.clip(p0, 0, r - 2)
    f = pos - p0
    x0, y0 = p0[..., 0], p0[..., 1]
    fx, fy = f[..., 0:1], f[..., 1:2]
    v00 = plane[x0, y0]
    v01 = plane[x0, y0 + 1]
    v10 = plane[x0 + 1, y0]
    v11 = plane[x0 + 1, y0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * (1 - fx) * fy
        + v10 * fx * (1 - fy)
        + v11 * fx * fy
    )


def _lerp_line(line: jax.Array, u: jax.Array) -> jax.Array:
    """line (R, C), u (...,) in [0,1] -> (..., C)."""
    r = line.shape[0]
    pos = jnp.clip(u, 0.0, 1.0) * (r - 1)
    p0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, r - 2)
    f = (pos - p0)[..., None]
    return line[p0] * (1 - f) + line[p0 + 1] * f


def tensorf_density(params: Dict, x01: jax.Array) -> jax.Array:
    """x01 (..., 3) in [0,1] -> density (..., 1). Sum over the three VM
    components of plane ⊙ line features (ref TensorVMEncoding density
    path + softplus activation)."""
    total = 0.0
    for k in range(3):
        a, b = _PLANE_AXES[k]
        pf = _bilerp_plane(params["density_planes"][k], x01[..., (a, b)])
        lf = _lerp_line(params["density_lines"][k], x01[..., _LINE_AXIS[k]])
        total = total + jnp.sum(pf * lf, axis=-1)
    return jax.nn.softplus(total - 5.0)[..., None]


def tensorf_rgb(params: Dict, x01: jax.Array, directions: jax.Array) -> jax.Array:
    """Appearance: concat per-axis plane⊙line features, project through the
    basis matrix, decode with the view-conditioned MLP head."""
    feats = []
    for k in range(3):
        a, b = _PLANE_AXES[k]
        pf = _bilerp_plane(params["app_planes"][k], x01[..., (a, b)])
        lf = _lerp_line(params["app_lines"][k], x01[..., _LINE_AXIS[k]])
        feats.append(pf * lf)
    app = jnp.concatenate(feats, axis=-1) @ params["basis"]
    d_enc = positional_encoding(directions, 2, include_input=True)  # 15 dims
    h = jnp.concatenate([app, d_enc], axis=-1)
    return jax.nn.sigmoid(mlp_apply(params["color_mlp"], h))


def tensorf_l1_reg(params: Dict) -> jax.Array:
    """L1 sparsity on the density factors (the reference's tensorf
    regularization term, models/tensorf.py get_loss_dict)."""
    return jnp.mean(jnp.abs(params["density_planes"])) + jnp.mean(
        jnp.abs(params["density_lines"])
    )
