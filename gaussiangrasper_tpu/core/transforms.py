"""Rotation / quaternion / rigid-transform primitives.

Pure-jnp, fully batched and differentiable. Quaternions use the (w, x, y, z)
convention, matching the convention consumed by the reference model's CUDA
backend (see /root/reference/nerfstudio/models/gaussian_splatting.py:56-71
`random_quat_tensor` and gsplat's `quat_to_rotmat` call sites at :516, :614).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along `axis` (safe at zero)."""
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


def quat_to_rotmat(quat: jax.Array) -> jax.Array:
    """Convert unit quaternion(s) (..., 4) in (w,x,y,z) order to rotation
    matrices (..., 3, 3). Input is normalized internally."""
    q = normalize(quat, axis=-1)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(rot: jax.Array) -> jax.Array:
    """Convert rotation matrices (..., 3, 3) to unit quaternions (..., 4) in
    (w,x,y,z) order. Branchless (jit-safe) Shepperd's method: compute all four
    candidate quaternions and select the numerically strongest one."""
    m00, m01, m02 = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    m10, m11, m12 = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    m20, m21, m22 = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*component^2 (always >= 0).
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    # Pick the candidate whose pivot (diagonal dominance) is largest.
    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)
    q = q[..., 0, :]
    q = normalize(q)
    # Canonicalize sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def random_quats(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """Uniformly random unit quaternions (n, 4), (w,x,y,z).

    Marsaglia/Shoemake subgroup construction (the reference's
    `random_quat_tensor` uses the same construction; its 4th component repeats
    sin instead of cos — a bug we do not reproduce)."""
    u, v, w = jax.random.uniform(key, (3, n), dtype=dtype)
    return jnp.stack(
        [
            jnp.sqrt(1.0 - u) * jnp.sin(2.0 * jnp.pi * v),
            jnp.sqrt(1.0 - u) * jnp.cos(2.0 * jnp.pi * v),
            jnp.sqrt(u) * jnp.sin(2.0 * jnp.pi * w),
            jnp.sqrt(u) * jnp.cos(2.0 * jnp.pi * w),
        ],
        axis=-1,
    )


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of (w,x,y,z) quaternions, broadcasting over batch."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def rotate_x(theta: float) -> jnp.ndarray:
    """Rotation matrix about +X by theta radians."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])
