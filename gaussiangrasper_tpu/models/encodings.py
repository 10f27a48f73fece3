"""Field encodings: positional (NeRF), spherical-harmonics, multires hash.

Role of the reference's field_components/encodings.py (767 LoC; tcnn-or-
torch dual implementations). TPU-native: pure jnp, the hash grid is a
vectorized gather (XLA turns it into efficient dynamic-gathers on HBM) —
no fused CUDA kernel needed because the surrounding MLP is tiny and the
gather dominates regardless.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from gaussiangrasper_tpu.core import sh as sh_mod

_PRIMES = (1, 2654435761, 805459861)


def positional_encoding(
    x: jax.Array, num_freqs: int, include_input: bool = True
) -> jax.Array:
    """NeRF sin/cos encoding, frequencies 2^0..2^(L-1) (the reference's
    NeRFEncoding)."""
    freqs = 2.0 ** jnp.arange(num_freqs)
    scaled = x[..., None] * freqs  # (..., D, L)
    enc = jnp.concatenate(
        [jnp.sin(jnp.pi * scaled), jnp.cos(jnp.pi * scaled)], axis=-1
    )
    enc = enc.reshape(*x.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def sh_encoding(dirs: jax.Array, degree: int = 4) -> jax.Array:
    """Direction encoding via the real SH basis (the reference's
    SHEncoding)."""
    return sh_mod.sh_basis(dirs)[..., : sh_mod.num_sh_bases(degree)]


def init_hash_grid(
    key: jax.Array,
    num_levels: int = 16,
    features_per_level: int = 2,
    log2_hashmap_size: int = 19,
    base_res: int = 16,
    max_res: int = 2048,
) -> Dict[str, jax.Array]:
    """Multiresolution hash-grid table (the reference's HashEncoding /
    instant-ngp). One table of (L, 2^H, F), U(-1e-4, 1e-4) init."""
    table = jax.random.uniform(
        key, (num_levels, 2**log2_hashmap_size, features_per_level),
        minval=-1e-4, maxval=1e-4,
    )
    growth = (
        jnp.exp((jnp.log(max_res) - jnp.log(base_res)) / max(num_levels - 1, 1))
        if num_levels > 1 else jnp.asarray(1.0)
    )
    res = jnp.floor(base_res * growth ** jnp.arange(num_levels))
    # float32 so the pytree is uniformly inexact (jax.grad-friendly); the
    # lookup stop-gradients it.
    return {"table": table, "resolutions": res.astype(jnp.float32)}


def hash_grid_encode(params: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    """Trilinear-interpolated hash lookup. x in [0, 1]^3, any batch shape.
    Returns (..., L*F)."""
    table = params["table"]           # (L, H, F)
    res = params["resolutions"]       # (L,)
    num_levels, hashmap_size, f = table.shape
    batch = x.shape[:-1]
    xf = x.reshape(-1, 3)

    def level(li):
        r = jax.lax.stop_gradient(res[li])
        pos = xf * r
        p0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - p0
        # 8 corners
        offs = jnp.array(
            [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
            jnp.int32,
        )
        corners = (p0[:, None, :] + offs[None, :, :]).astype(jnp.uint32)  # (N, 8, 3)
        h = (
            corners[..., 0] * jnp.uint32(_PRIMES[0])
            ^ corners[..., 1] * jnp.uint32(_PRIMES[1])
            ^ corners[..., 2] * jnp.uint32(_PRIMES[2])
        ) % jnp.uint32(hashmap_size)
        h = h.astype(jnp.int32)
        vals = table[li, h]  # (N, 8, F)
        w = jnp.prod(
            jnp.where(offs[None, :, :] == 1, frac[:, None, :], 1.0 - frac[:, None, :]),
            axis=-1,
        )  # (N, 8)
        return jnp.sum(vals * w[..., None], axis=1)  # (N, F)

    feats = jax.vmap(level)(jnp.arange(num_levels))  # (L, N, F)
    return jnp.moveaxis(feats, 0, 1).reshape(*batch, num_levels * f)
