"""Mip-NeRF primitives: conical frustums as Gaussians + integrated PE.

Role of the reference's conical-frustum math in nerfstudio/utils/math.py
(`conical_frustum_to_gaussian`, used by models/mipnerf.py through
`Frustums.get_gaussian_blob`, cameras/rays.py:33-106) and the integrated
positional encoding consumed by the mipnerf field
(/root/reference/nerfstudio/models/mipnerf.py via
field_components/encodings.py `NeRFEncoding(..., covs)` path).

TPU notes: everything is closed-form elementwise math over (rays, samples)
arrays — XLA fuses the whole encoding into the first matmul of the field
MLP, so there is nothing to hand-kernel here; keeping shapes static
(fixed sample counts) is the only requirement.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def conical_frustum_to_gaussian(
    origins: jax.Array,      # (..., 3)
    directions: jax.Array,   # (..., 3) unit
    starts: jax.Array,       # (..., S) frustum near ts
    ends: jax.Array,         # (..., S) frustum far ts
    radius: jax.Array,       # (..., 1) cone radius at unit distance
) -> Tuple[jax.Array, jax.Array]:
    """Approximate each conical frustum with a Gaussian.

    Returns (means (..., S, 3), cov_diag (..., S, 3)) using the stable
    parameterization from the mip-NeRF paper (eq. 7), matching the
    reference's `conical_frustum_to_gaussian` (utils/math.py).
    """
    mu = 0.5 * (starts + ends)          # (..., S)
    hw = 0.5 * (ends - starts)          # half width
    mu2, hw2 = mu * mu, hw * hw
    denom = 3.0 * mu2 + hw2
    t_mean = mu + (2.0 * mu * hw2) / denom
    t_var = hw2 / 3.0 - (4.0 / 15.0) * (hw2 * hw2 * (12.0 * mu2 - hw2)) / (denom * denom)
    r_var = radius * radius * (
        mu2 / 4.0 + (5.0 / 12.0) * hw2 - (4.0 / 15.0) * (hw2 * hw2) / denom
    )

    means = origins[..., None, :] + directions[..., None, :] * t_mean[..., None]
    d2 = directions * directions                       # (..., 3)
    d_norm2 = jnp.maximum(jnp.sum(d2, axis=-1, keepdims=True), 1e-10)
    # diagonal of  t_var * d d^T + r_var * (I - d d^T / ||d||^2)
    cov_diag = (
        t_var[..., None] * d2[..., None, :]
        + r_var[..., None] * (1.0 - d2[..., None, :] / d_norm2[..., None, :])
    )
    return means, cov_diag


def integrated_pos_enc(
    means: jax.Array,       # (..., 3)
    cov_diag: jax.Array,    # (..., 3)
    num_freqs: int,
) -> jax.Array:
    """Expected sin/cos of a Gaussian under frequencies 2^0..2^(L-1)
    (mip-NeRF IPE): E[sin(2^l x)] = sin(2^l mu) exp(-0.5 4^l var).
    Returns (..., 6*num_freqs)."""
    freqs = 2.0 ** jnp.arange(num_freqs)
    scaled = means[..., None] * freqs                       # (..., 3, L)
    var = cov_diag[..., None] * (freqs * freqs)             # (..., 3, L)
    damp = jnp.exp(-0.5 * var)
    enc = jnp.concatenate([jnp.sin(scaled) * damp, jnp.cos(scaled) * damp], axis=-1)
    return enc.reshape(*means.shape[:-1], -1)


def pixel_radius(pixel_area: jax.Array) -> jax.Array:
    """Cone radius at unit distance from the per-ray pixel footprint:
    r = 2/sqrt(12) * pixel width (the mip-NeRF base-radius convention the
    reference computes in cameras.py `generate_rays` as `pixel_area`)."""
    return (2.0 / jnp.sqrt(12.0)) * jnp.sqrt(pixel_area)
