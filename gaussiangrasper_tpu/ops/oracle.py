"""Brute-force per-pixel reference renderer (the correctness oracle).

O(N x pixels) evaluation of every Gaussian at every pixel — trivially
correct, differentiable by plain autodiff, and independent of the tile
pipeline's binning/sort/capacity machinery. Used by the test-suite the way
BASELINE.md's config 1 prescribes (10k Gaussians, 256x256, CPU): the tiled
rasterizer must match this image and its gradients allclose.

It replicates the CUDA kernel's *inclusion* semantics exactly: a Gaussian
contributes to a pixel iff its radius square overlaps the pixel's tile
(tile-granular inclusion — the CUDA rasterizer tests bins, not pixels), its
sigma is non-negative, and its alpha clears 1/255; compositing terminates
when transmittance would drop to <= 1e-4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussiangrasper_tpu.ops.projection import ProjectedGaussians
from gaussiangrasper_tpu.ops.rasterize import (
    ALPHA_CLAMP,
    ALPHA_CUTOFF,
    composite_weights,
)


def render_oracle(
    proj: ProjectedGaussians,
    colors: jax.Array,
    opacities: jax.Array,
    background: jax.Array,
    width: int,
    height: int,
    tile_size: int = 16,
    pixel_chunk: int = 2048,
) -> jax.Array:
    """Render (H, W, C) by evaluating all N Gaussians at every pixel."""
    n = proj.xys.shape[0]

    # Depth order (front to back); culled entries last.
    alive = proj.radii > 0.0
    order = jnp.argsort(jnp.where(alive, proj.depths, jnp.inf))
    xys = proj.xys[order]
    conics = proj.conics[order]
    radii = proj.radii[order]
    opac = jnp.where(alive[order], opacities[order], 0.0)
    cols = colors[order]

    # Tile-granular inclusion rectangle per Gaussian, in pixels.
    tw = -(-width // tile_size)
    th = -(-height // tile_size)
    x0t = jnp.clip(jnp.floor((xys[:, 0] - radii) / tile_size), 0, tw)
    y0t = jnp.clip(jnp.floor((xys[:, 1] - radii) / tile_size), 0, th)
    x1t = jnp.clip(jnp.floor((xys[:, 0] + radii) / tile_size) + 1, 0, tw)
    y1t = jnp.clip(jnp.floor((xys[:, 1] + radii) / tile_size) + 1, 0, th)

    ys, xs = jnp.mgrid[0:height, 0:width]
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(xys.dtype)
    total = pix.shape[0]
    chunk = min(pixel_chunk, total)
    n_chunks = -(-total // chunk)
    pad = n_chunks * chunk - total
    pix_pad = jnp.pad(pix, ((0, pad), (0, 0)))

    def render_chunk(p):
        # p: (chunk, 2) pixel coords
        ptx = jnp.floor(p[:, 0] / tile_size)
        pty = jnp.floor(p[:, 1] / tile_size)
        in_tile = (
            (x0t[:, None] <= ptx[None, :])
            & (ptx[None, :] < x1t[:, None])
            & (y0t[:, None] <= pty[None, :])
            & (pty[None, :] < y1t[:, None])
        )  # (N, chunk)
        dx = p[None, :, 0] - xys[:, 0:1]
        dy = p[None, :, 1] - xys[:, 1:2]
        sigma = (
            0.5 * (conics[:, 0:1] * dx * dx + conics[:, 2:3] * dy * dy)
            + conics[:, 1:2] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_CLAMP, opac[:, None] * jnp.exp(-sigma))
        ok = in_tile & (radii[:, None] > 0) & (sigma >= 0.0) & (alpha >= ALPHA_CUTOFF)
        alpha = jnp.where(ok, alpha, 0.0)
        weights, t_final = composite_weights(alpha, axis=0)  # (N, chunk), (chunk,)
        out = weights.T @ cols  # (chunk, C)
        return out + t_final[:, None] * background[None, :]

    out = jax.lax.map(
        jax.checkpoint(render_chunk), pix_pad.reshape(n_chunks, chunk, 2)
    )
    c = colors.shape[-1]
    return out.reshape(-1, c)[:total].reshape(height, width, c)
