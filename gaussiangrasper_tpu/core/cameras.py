"""Camera primitives, as JAX pytrees.

The reference carries a large batched `Cameras` TensorDataclass
(/root/reference/nerfstudio/cameras/cameras.py:69). The Gaussian-splatting
hot path only consumes: fx/fy/cx/cy, width/height, camera_to_worlds, and
`rescale_output_resolution` (ref nerfstudio/models/gaussian_splatting.py:
655-682). We keep the jit-side camera exactly that lean; distortion handling
lives host-side in the data layer (images are undistorted once, up-front,
matching full_images_datamanager.py:123-285).

Conventions:
- `camera_to_world` is a (3, 4) OpenGL-style pose (x right, y up, z backward),
  the nerfstudio convention.
- `view_matrix` converts to the rasterizer's camera frame (x right, y down,
  z forward) by flipping the y/z columns — the same net transform as the
  reference's `R @ SO3.from_x_radians(pi)` edit (ref gaussian_splatting.py:
  658-668) — then inverts analytically.
"""

from __future__ import annotations

from enum import Enum

import jax
import jax.numpy as jnp
from flax import struct


class CameraType(Enum):
    PERSPECTIVE = 1
    FISHEYE = 2
    EQUIRECTANGULAR = 3


@struct.dataclass
class Camera:
    """A single pinhole camera. Width/height are static (compile-time) ints."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    camera_to_world: jax.Array  # (3, 4) OpenGL c2w
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, fx, fy, cx, cy, camera_to_world, width: int, height: int) -> "Camera":
        return cls(
            fx=jnp.asarray(fx, jnp.float32),
            fy=jnp.asarray(fy, jnp.float32),
            cx=jnp.asarray(cx, jnp.float32),
            cy=jnp.asarray(cy, jnp.float32),
            camera_to_world=jnp.asarray(camera_to_world, jnp.float32),
            width=int(width),
            height=int(height),
        )

    def rescale(self, scale: float) -> "Camera":
        """Return a camera with rescaled output resolution (ref
        cameras.py:935 `rescale_output_resolution`, used every GS train step
        for the coarse-to-fine schedule)."""
        return Camera(
            fx=self.fx * scale,
            fy=self.fy * scale,
            cx=self.cx * scale,
            cy=self.cy * scale,
            camera_to_world=self.camera_to_world,
            # floor, matching the reference's rescale + the //d image resize
            width=int(self.width * scale),
            height=int(self.height * scale),
        )

    @property
    def origin(self) -> jax.Array:
        return self.camera_to_world[:3, 3]


def view_matrix(camera_to_world: jax.Array) -> jax.Array:
    """World-to-camera (4, 4) matrix in the rasterizer frame (z forward).

    Equivalent to the reference's z-flip + analytic inverse
    (gaussian_splatting.py:658-668), done in one shot: flipping the y and z
    columns of R is R @ diag(1, -1, -1).
    """
    R = camera_to_world[:3, :3] * jnp.array([1.0, -1.0, -1.0])
    t = camera_to_world[:3, 3:4]
    R_inv = R.T
    t_inv = -R_inv @ t
    view = jnp.eye(4, dtype=camera_to_world.dtype)
    view = view.at[:3, :3].set(R_inv)
    view = view.at[:3, 3:4].set(t_inv)
    return view


def projection_matrix(znear: float, zfar: float, fovx, fovy) -> jax.Array:
    """OpenGL-style perspective projection (ref gaussian_splatting.py:87-105).

    Kept for API parity; the projection op computes pixel centers directly
    from intrinsics (mathematically identical for symmetric frusta)."""
    t = znear * jnp.tan(0.5 * fovy)
    r = znear * jnp.tan(0.5 * fovx)
    n, f = znear, zfar
    return jnp.array(
        [
            [n / r, 0.0, 0.0, 0.0],
            [0.0, n / t, 0.0, 0.0],
            [0.0, 0.0, (f + n) / (f - n), -f * n / (f - n)],
            [0.0, 0.0, 1.0, 0.0],
        ],
        dtype=jnp.float32,
    )
