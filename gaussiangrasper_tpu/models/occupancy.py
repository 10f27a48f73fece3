"""Occupancy-grid acceleration for ray marching (the nerfacc analog).

Role of the reference's nerfacc dependency (occupancy grid + efficient
sampling for the instant-ngp family, /root/reference/nerfstudio/
model_components/ray_samplers.py / models/instant_ngp.py). TPU-native:
a dense binary grid over the scene AABB updated by EMA of sampled
densities; sampling stays fixed-size (static shapes) — instead of
variable-length skips, samples landing in empty cells get zero weight via
a density mask, which XLA fuses into the field evaluation. The FLOP win
comes from evaluating the expensive field only where the grid is occupied
(lax.select on the encoded features is free; the MLP is applied to all
samples but they are masked — for the hash-grid field the gather is the
cost, so masked gathers clamp to a single cell index).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp


class OccupancyGrid(NamedTuple):
    density: jax.Array   # (R, R, R) EMA of max density per cell
    aabb: jax.Array      # (2, 3) scene bounds
    threshold: float

    @property
    def resolution(self) -> int:
        return self.density.shape[0]


def init_grid(aabb, resolution: int = 64, threshold: float = 0.01) -> OccupancyGrid:
    return OccupancyGrid(
        density=jnp.zeros((resolution,) * 3, jnp.float32),
        aabb=jnp.asarray(aabb, jnp.float32),
        threshold=threshold,
    )


def _cell_of(grid: OccupancyGrid, positions: jax.Array) -> jax.Array:
    """World positions (..., 3) -> integer cell indices (..., 3), clipped."""
    lo, hi = grid.aabb[0], grid.aabb[1]
    u = (positions - lo) / (hi - lo)
    idx = jnp.floor(u * grid.resolution).astype(jnp.int32)
    return jnp.clip(idx, 0, grid.resolution - 1)


def update_grid(
    grid: OccupancyGrid,
    positions: jax.Array,   # (M, 3) sampled points (e.g. this step's ray samples)
    densities: jax.Array,   # (M,) field densities at those points
    ema: float = 0.95,
) -> OccupancyGrid:
    """EMA decay + scatter-max of observed densities (nerfacc's
    every-16-steps update loop)."""
    idx = _cell_of(grid, positions)
    decayed = grid.density * ema
    updated = decayed.at[idx[:, 0], idx[:, 1], idx[:, 2]].max(densities)
    return grid._replace(density=updated)


def occupancy_mask(grid: OccupancyGrid, positions: jax.Array) -> jax.Array:
    """(...,) bool — True where the containing cell is occupied."""
    idx = _cell_of(grid, positions)
    return grid.density[idx[..., 0], idx[..., 1], idx[..., 2]] > grid.threshold


def masked_densities(
    grid: OccupancyGrid, positions: jax.Array, densities: jax.Array
) -> jax.Array:
    """Zero density outside occupied cells (the static-shape form of
    nerfacc's empty-space skipping: skipped samples contribute exactly
    nothing to the volume-rendering weights)."""
    m = occupancy_mask(grid, positions)
    return jnp.where(m[..., None], densities, 0.0)
