"""NeuS-style SDF field: signed distance + logistic-CDF alpha rendering.

Role of the reference's fields/sdf_field.py + models/neus.py /
models/base_surface_model.py (SDFField, NeuSSampler's alpha conversion,
eikonal regularization). Two variants share this module, mirroring the
reference's pair:

  - "neus":       positional-encoded SDF MLP (fields/sdf_field.py torch path)
  - "neus-facto": multires hash-grid features + a small SDF head
                  (neus_facto.py / the tcnn-encoder path)

TPU notes: the SDF gradient (needed for both the alpha estimator's cos
term and the eikonal loss) comes from forward-mode `jax.jvp` along the ray
direction plus one `jax.grad` for the full spatial gradient — both trace
into the same jitted program; no finite differences, no double-backward
CUDA graphs as in the torch implementation.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from gaussiangrasper_tpu.models.efd import init_mlp, mlp_apply
from gaussiangrasper_tpu.models.encodings import (
    hash_grid_encode,
    init_hash_grid,
    positional_encoding,
)


def init_sdf_field(
    key: jax.Array,
    variant: str = "neus",
    pos_freqs: int = 6,
    hidden: int = 128,
    geo_features: int = 15,
    hash_levels: int = 12,
    log2_hashmap_size: int = 17,
) -> Dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params: Dict = {
        # inv_std = exp(10 * s); init s=0.05 -> std ~ 0.6 (ref
        # base_surface_model.py learned variance init 0.05, scale 10)
        "s": jnp.asarray(0.05, jnp.float32),
    }
    if variant == "neus-facto":
        params["grid"] = init_hash_grid(
            k1, num_levels=hash_levels, features_per_level=2,
            log2_hashmap_size=log2_hashmap_size,
        )
        in_dim = hash_levels * 2 + 3
    else:
        in_dim = 3 + 6 * pos_freqs
    params["sdf_mlp"] = init_mlp(k2, in_dim, 1 + geo_features, (hidden, hidden))
    # sphere-ish init: bias the final layer so sdf(x) ~ ||x|| - r at start
    # (the geometric initialization trick of IDR/NeuS, fields/sdf_field.py)
    params["sdf_mlp"]["b%d" % (len(params["sdf_mlp"]) // 2 - 1)] = (
        params["sdf_mlp"]["b%d" % (len(params["sdf_mlp"]) // 2 - 1)].at[0].set(0.5)
    )
    # color head: position + normal + viewdir PE + geo features (IDR head)
    params["color_mlp"] = init_mlp(
        k3, 3 + 3 + (3 + 6 * 2) + geo_features, 3, (hidden,)
    )
    return params


def sdf_and_features(
    params: Dict, positions: jax.Array, scene_scale: float, pos_freqs: int = 6
) -> Tuple[jax.Array, jax.Array]:
    """(sdf (..., 1), geo features (..., G))."""
    if "grid" in params:
        x01 = jnp.clip(positions / (2 * scene_scale) + 0.5, 0.0, 1.0)
        enc = jnp.concatenate([positions, hash_grid_encode(params["grid"], x01)], -1)
    else:
        enc = positional_encoding(positions, pos_freqs)
    h = mlp_apply(params["sdf_mlp"], enc)
    return h[..., :1], h[..., 1:]


def sdf_value(params, positions, scene_scale, pos_freqs=6):
    return sdf_and_features(params, positions, scene_scale, pos_freqs)[0][..., 0]


def sdf_gradient(params, positions, scene_scale, pos_freqs=6):
    """Spatial SDF gradient (normals + eikonal term), via reverse-mode on
    the summed sdf — exact, one extra pass, fuses under jit."""
    flat = positions.reshape(-1, 3)
    g = jax.grad(
        lambda p: jnp.sum(sdf_value(params, p, scene_scale, pos_freqs))
    )(flat)
    return g.reshape(positions.shape)


def neus_alphas(
    sdf: jax.Array,        # (..., S, 1) at sample midpoints
    grad: jax.Array,       # (..., S, 3) sdf spatial gradient there
    directions: jax.Array, # (..., S, 3)
    deltas: jax.Array,     # (..., S, 1)
    inv_std: jax.Array,    # scalar
    cos_anneal: jax.Array | float = 1.0,
) -> jax.Array:
    """The NeuS unbiased alpha estimator (models/neus.py get_alphas):
    estimate the section-endpoint SDFs from the midpoint value and the
    directional derivative, then alpha = (Phi(prev) - Phi(next)) / Phi(prev).
    """
    cos = jnp.sum(grad * directions, axis=-1, keepdims=True)
    # annealed + clamped to non-positive (surfaces face the camera)
    cos = -(
        jax.nn.relu(-cos * 0.5 + 0.5) * (1.0 - cos_anneal)
        + jax.nn.relu(-cos) * cos_anneal
    )
    est_prev = sdf - cos * deltas * 0.5
    est_next = sdf + cos * deltas * 0.5
    cdf_prev = jax.nn.sigmoid(est_prev * inv_std)
    cdf_next = jax.nn.sigmoid(est_next * inv_std)
    return jnp.clip((cdf_prev - cdf_next + 1e-5) / (cdf_prev + 1e-5), 0.0, 1.0)


def alphas_to_weights(alphas: jax.Array) -> jax.Array:
    """Front-to-back compositing weights from per-sample alphas."""
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alphas[..., :1, :]), 1.0 - alphas[..., :-1, :] + 1e-7],
            axis=-2,
        ),
        axis=-2,
    )
    return alphas * trans


def sdf_rgb(
    params: Dict,
    positions: jax.Array,
    directions: jax.Array,
    normals: jax.Array,
    geo: jax.Array,
) -> jax.Array:
    """IDR-style color head conditioned on (x, n, v, geo)."""
    d_enc = positional_encoding(directions, 2)
    h = jnp.concatenate([positions, normals, d_enc, geo], axis=-1)
    return jax.nn.sigmoid(mlp_apply(params["color_mlp"], h))
