"""Gaussian field parameters: a fixed-capacity pytree with an alive mask.

Replaces the reference's six mutable `nn.Parameter`s whose *length* changes
at every densify/cull (ref /root/reference/nerfstudio/models/
gaussian_splatting.py:248-281, 333-371). XLA wants static shapes, so the
TPU-native design allocates a capacity-C buffer per field plus an `alive`
mask; densification writes into free slots and culling clears mask bits —
no reallocation, no recompilation, no optimizer-state surgery (dead slots
simply carry zero gradients). Capacity growth (rare) happens host-side
between jitted steps by padding every leaf.

Parameter semantics match the reference:
  means          (C, 3)   world positions
  log_scales     (C, 3)   log of per-axis scales
  quats          (C, 4)   (w,x,y,z), normalized at use
  opacity_logits (C,)     sigmoid -> opacity
  sh_coeffs      (C, 25, 3) SH color coefficients ("colors_all", degree 4)
  features       (C, F)   latent CLIP features (F=32)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussiangrasper_tpu.core import sh
from gaussiangrasper_tpu.core.transforms import random_quats

SH_C0 = 0.28209479177387814


def rgb_to_sh0(rgb):
    """RGB in [0,1] -> 0th SH coefficient (ref gaussian_splatting.py:73-78)."""
    return (rgb - 0.5) / SH_C0


def sh0_to_rgb(c0):
    return c0 * SH_C0 + 0.5


class GaussianParams(NamedTuple):
    """Trainable Gaussian field. All leading dims are the capacity C."""

    means: jax.Array
    log_scales: jax.Array
    quats: jax.Array
    opacity_logits: jax.Array
    sh_coeffs: jax.Array
    features: jax.Array

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    def pad_to(self, new_capacity: int) -> "GaussianParams":
        """Grow capacity host-side (new slots are dead until densify fills
        them). Quats padded with identity to stay normalizable."""
        c = self.capacity
        extra = new_capacity - c
        if extra <= 0:
            return self

        def pad(x, fill=0.0):
            widths = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths, constant_values=fill)

        return GaussianParams(
            means=pad(self.means),
            log_scales=pad(self.log_scales),
            quats=jnp.concatenate(
                [self.quats,
                 jnp.tile(jnp.array([[1.0, 0, 0, 0]], self.quats.dtype), (extra, 1))]
            ),
            opacity_logits=pad(self.opacity_logits),
            sh_coeffs=pad(self.sh_coeffs),
            features=pad(self.features),
        )


def knn_mean_distance(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Host-side mean distance to the k nearest neighbors (used for initial
    scales, ref gaussian_splatting.py:259-263 `k_nearest_sklearn`)."""
    from sklearn.neighbors import NearestNeighbors

    nn_model = NearestNeighbors(n_neighbors=k + 1, algorithm="auto").fit(points)
    distances, _ = nn_model.kneighbors(points)
    return distances[:, 1:].mean(axis=-1).astype(np.float32)


def init_from_seeds(
    key: jax.Array,
    seed_xyz: np.ndarray,
    seed_rgb: np.ndarray,
    *,
    feature_dim: int = 32,
    sh_degree: int = 4,
    capacity: Optional[int] = None,
    init_opacity: float = 0.1,
) -> Tuple[GaussianParams, jax.Array]:
    """Initialize from SfM/RGB-D seed points (ref gaussian_splatting.py:
    248-280). seed_rgb in [0, 255]. Returns (params, alive)."""
    n = seed_xyz.shape[0]
    cap = capacity or n
    assert cap >= n
    dim_sh = sh.num_sh_bases(sh_degree)

    avg_dist = np.maximum(knn_mean_distance(np.asarray(seed_xyz)), 1e-7)
    log_scales = jnp.log(jnp.asarray(avg_dist))[:, None].repeat(3, axis=1)

    shs = jnp.zeros((n, dim_sh, 3))
    shs = shs.at[:, 0, :].set(rgb_to_sh0(jnp.asarray(seed_rgb, jnp.float32) / 255.0))

    k_quat, k_feat = jax.random.split(key)
    params = GaussianParams(
        means=jnp.asarray(seed_xyz, jnp.float32),
        log_scales=log_scales,
        quats=random_quats(k_quat, n),
        opacity_logits=jnp.full((n,), float(jax.scipy.special.logit(init_opacity))),
        sh_coeffs=shs,
        features=jax.random.uniform(k_feat, (n, feature_dim)) * 2.0 - 1.0,
    )
    params = params.pad_to(cap)
    alive = jnp.arange(cap) < n
    return params, alive


def init_random(
    key: jax.Array,
    n: int = 500_000,
    *,
    extent: float = 10.0,
    feature_dim: int = 32,
    sh_degree: int = 4,
    capacity: Optional[int] = None,
    init_opacity: float = 0.1,
    init_scale: Optional[float] = None,
) -> Tuple[GaussianParams, jax.Array]:
    """Random-init fallback (ref gaussian_splatting.py:252: 500k uniform in
    a +-5 cube with random colors)."""
    cap = capacity or n
    # a capacity below n cannot hold n points: seed what fits (a pinned
    # small --capacity used to produce an n-sized field with a cap-sized
    # alive mask — shape mismatch downstream)
    n = min(n, cap)
    dim_sh = sh.num_sh_bases(sh_degree)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    means = (jax.random.uniform(k1, (n, 3)) - 0.5) * extent
    if init_scale is None:
        # expected NN distance for a uniform cloud
        init_scale = float(extent * (1.0 / max(n, 1)) ** (1.0 / 3.0))
    shs = jnp.zeros((n, dim_sh, 3))
    shs = shs.at[:, 0, :].set(rgb_to_sh0(jax.random.uniform(k2, (n, 3))))
    params = GaussianParams(
        means=means,
        log_scales=jnp.full((n, 3), float(np.log(init_scale))),
        quats=random_quats(k3, n),
        opacity_logits=jnp.full((n,), float(jax.scipy.special.logit(init_opacity))),
        sh_coeffs=shs,
        features=jax.random.uniform(k4, (n, feature_dim)) * 2.0 - 1.0,
    )
    params = params.pad_to(cap)
    alive = jnp.arange(cap) < n
    return params, alive
