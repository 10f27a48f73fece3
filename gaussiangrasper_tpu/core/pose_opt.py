"""Learned camera-pose refinement (SO3xR3 / SE3 deltas).

Role of the reference's CameraOptimizer (/root/reference/nerfstudio/
cameras/camera_optimizers.py:82-184): a per-camera 6-dof tangent-space
delta applied to the camera-to-world pose, trained jointly with the model
(mode "off" for gaussian-splatting by default, ref gaussian_splatting.py:
191, but part of the framework surface). Pure-jnp exponential maps (the
reference's lie_groups.py).
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp


def exp_map_so3(omega: jax.Array, eps: float = 1e-8) -> jax.Array:
    """so(3) tangent (..., 3) -> rotation matrix (..., 3, 3) (Rodrigues)."""
    theta = jnp.sqrt(jnp.sum(omega * omega, axis=-1, keepdims=True) + eps)
    axis = omega / theta
    k = _skew(axis)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), k.shape)
    return eye + s * k + (1.0 - c) * (k @ k)


def exp_map_se3(tangent: jax.Array, eps: float = 1e-8) -> jax.Array:
    """se(3) tangent (..., 6) [rho, omega] -> (..., 3, 4) transform with the
    proper V-matrix coupling of translation and rotation."""
    rho, omega = tangent[..., :3], tangent[..., 3:]
    theta = jnp.sqrt(jnp.sum(omega * omega, axis=-1, keepdims=True) + eps)
    axis = omega / theta
    k = _skew(axis)
    th = theta[..., None]
    s, c = jnp.sin(th), jnp.cos(th)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tangent.dtype), k.shape)
    rot = eye + s * k + (1.0 - c) * (k @ k)
    v = eye + ((1.0 - c) / th) * k + ((th - s) / th) * (k @ k)
    t = (v @ rho[..., None])[..., 0]
    return jnp.concatenate([rot, t[..., None]], axis=-1)


def _skew(v: jax.Array) -> jax.Array:
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def init_pose_deltas(num_cameras: int, dtype=jnp.float32) -> jax.Array:
    """Zero 6-dof tangent per camera (identity adjustment)."""
    return jnp.zeros((num_cameras, 6), dtype)


def apply_pose_delta(
    camera_to_world: jax.Array,
    delta: jax.Array,
    mode: Literal["off", "SO3xR3", "SE3"] = "SO3xR3",
) -> jax.Array:
    """Apply a learned delta to a (3, 4) c2w pose (ref apply_to_camera
    :150-176: adjustment composed on the right of the pose)."""
    if mode == "off":
        return camera_to_world
    if mode == "SO3xR3":
        rot = exp_map_so3(delta[3:])
        adj = jnp.concatenate([rot, delta[:3][:, None]], axis=-1)
    elif mode == "SE3":
        adj = exp_map_se3(delta)
    else:
        raise ValueError(mode)
    r = camera_to_world[:3, :3] @ adj[:3, :3]
    t = camera_to_world[:3, :3] @ adj[:3, 3] + camera_to_world[:3, 3]
    return jnp.concatenate([r, t[:, None]], axis=-1)
