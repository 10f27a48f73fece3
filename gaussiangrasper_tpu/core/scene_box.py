"""Scene bounds: axis-aligned and oriented crop boxes.

Role of the reference's data/scene_box.py (SceneBox + OrientedBox; the GS
model consults `crop_box.within(means)` at eval to render a sub-volume,
gaussian_splatting.py:649-654). Pytree-friendly jnp.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussiangrasper_tpu.core.transforms import quat_to_rotmat


class SceneBox(NamedTuple):
    aabb: jax.Array  # (2, 3) [min; max]

    def within(self, points: jax.Array) -> jax.Array:
        lo, hi = self.aabb[0], self.aabb[1]
        return jnp.all((points >= lo) & (points <= hi), axis=-1)

    def get_center(self) -> jax.Array:
        return 0.5 * (self.aabb[0] + self.aabb[1])


class OrientedBox(NamedTuple):
    """Rotation (quat wxyz) + translation + per-axis size."""

    quat: jax.Array  # (4,)
    translation: jax.Array  # (3,)
    size: jax.Array  # (3,)

    def within(self, points: jax.Array) -> jax.Array:
        """(N,) bool — inside the oriented box (ref scene_box.py
        OrientedBox.within)."""
        r = quat_to_rotmat(self.quat)
        local = (points - self.translation) @ r  # R^T @ (p - t)
        half = 0.5 * self.size
        return jnp.all(jnp.abs(local) <= half, axis=-1)


def aabb_of(points) -> SceneBox:
    points = jnp.asarray(points)
    return SceneBox(jnp.stack([points.min(0), points.max(0)]))
