"""Perspective projection of 3D Gaussians to screen space (EWA splatting).

TPU-native replacement for the reference's CUDA `ProjectGaussians.apply`
(call site /root/reference/nerfstudio/models/gaussian_splatting.py:699-713).
Fully vectorized jnp over all N Gaussians — this stage is pure elementwise
math and small fixed-size linear algebra, so XLA fusion handles it at
speed-of-light; no hand-written kernel is needed. Autodiff supplies exact
gradients for means/scales/quats (the CUDA backward is hand-written; here it
comes for free and is fused into the same program).

Numerical conventions match the gsplat-0.1.0 semantics the reference model
was trained against:
- 3D covariance: Sigma = R S S^T R^T from (quat, exp-scales).
- camera-frame clip: depth <= clip_thresh (0.01) culls the Gaussian.
- EWA Jacobian with tan-FOV clamping at 1.3x the half-FOV.
- +0.3 px blur added to the 2D covariance diagonal (low-pass).
- conic = inverse 2D covariance; radius = ceil(3 * sqrt(lambda_max)) with the
  eigenvalue discriminant floored at 0.1.
- pixel centers sit at integer coordinates: xys = f * x/z + c - 0.5.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gaussiangrasper_tpu.core.transforms import quat_to_rotmat, normalize


class ProjectedGaussians(NamedTuple):
    """Screen-space Gaussians. All arrays are length-N leading dim."""

    xys: jax.Array      # (N, 2) pixel-space centers
    depths: jax.Array   # (N,) camera-frame z
    conics: jax.Array   # (N, 3) inverse 2D covariance (a, b, c): [[a,b],[b,c]]^-1 packed
    radii: jax.Array    # (N,) float radius in pixels; 0 => culled/invisible
    cov2d: jax.Array    # (N, 3) 2D covariance packed (A, B, C)


def compute_cov3d(scales: jax.Array, quats: jax.Array) -> jax.Array:
    """3D covariance (N, 3, 3) from linear scales (N, 3) and quats (N, 4).

    The M @ M^T product is expanded elementwise: batched (N, 3, 3)
    matmuls hit the MXU at 3/128 utilization and measurably dominate the
    projection stage on the v5e; as elementwise VPU math the whole
    projection is memory-speed."""
    R = quat_to_rotmat(quats)
    M = R * scales[..., None, :]  # R @ diag(s), (N, 3, 3)
    # sigma[i, j] = sum_k M[i, k] * M[j, k], written out so it stays on
    # the VPU (no batched-3x3 dot).
    rows = [M[..., i, :] for i in range(3)]  # each (N, 3)

    def dot(a, b):
        return jnp.sum(a * b, axis=-1)

    c00, c01, c02 = dot(rows[0], rows[0]), dot(rows[0], rows[1]), dot(rows[0], rows[2])
    c11, c12, c22 = dot(rows[1], rows[1]), dot(rows[1], rows[2]), dot(rows[2], rows[2])
    return jnp.stack(
        [jnp.stack([c00, c01, c02], -1),
         jnp.stack([c01, c11, c12], -1),
         jnp.stack([c02, c12, c22], -1)], axis=-2,
    )


def project_gaussians(
    means: jax.Array,
    scales: jax.Array,
    quats: jax.Array,
    viewmat: jax.Array,
    fx,
    fy,
    cx,
    cy,
    width: int,
    height: int,
    *,
    eps2d: float = 0.3,
    clip_thresh: float = 0.01,
    mask: Optional[jax.Array] = None,
) -> ProjectedGaussians:
    """Project N Gaussians into screen space.

    Args:
      means: (N, 3) world-space centers.
      scales: (N, 3) *linear* scales (callers exp() their log-scales).
      quats: (N, 4) rotations (w,x,y,z); normalized internally.
      viewmat: (4, 4) world-to-camera, camera frame z-forward/y-down.
      fx, fy, cx, cy: intrinsics (scalars).
      width, height: image size in pixels (static).
      mask: optional (N,) bool; False rows are force-culled (capacity slots).
    """
    dtype = means.dtype
    R_v = viewmat[:3, :3]
    t_v = viewmat[:3, 3]

    # Camera-frame positions.
    p_cam = means @ R_v.T + t_v  # (N, 3)
    x_c, y_c, z_c = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2]
    depths = z_c

    valid = z_c > clip_thresh
    if mask is not None:
        valid = valid & mask
    # Guard z for the divisions below; culled rows are zeroed at the end.
    z_safe = jnp.where(valid, z_c, 1.0)

    # 3D covariance in world frame, rotated into camera frame. The
    # R_v conjugation is expanded as two broadcasted sums rather than
    # batched (N, 3, 3) dots (MXU-hostile tiny matmuls).
    cov3d = compute_cov3d(scales, normalize(quats))
    # tmp[n, i, j] = sum_k R_v[i, k] cov3d[n, k, j]
    tmp = jnp.sum(R_v[None, :, :, None] * cov3d[:, None, :, :], axis=2)
    # cov_cam[n, i, j] = sum_k tmp[n, i, k] R_v[j, k]
    cov_cam = jnp.sum(tmp[:, :, None, :] * R_v[None, None, :, :], axis=3)

    # EWA Jacobian with FOV clamping (suppresses splat stretching at frustum
    # edges — same 1.3x guard band as the CUDA kernel).
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = z_safe * jnp.clip(x_c / z_safe, -lim_x, lim_x)
    ty = z_safe * jnp.clip(y_c / z_safe, -lim_y, lim_y)

    rz = 1.0 / z_safe
    rz2 = rz * rz
    # J = [[fx/z, 0, -fx*tx/z^2], [0, fy/z, -fy*ty/z^2]]  (2, 3) per Gaussian
    j00 = fx * rz
    j02 = -fx * tx * rz2
    j11 = fy * rz
    j12 = -fy * ty * rz2

    # cov2d = J cov_cam J^T, expanded to avoid materializing (N, 2, 3) matmuls
    # as generic batched GEMMs (tiny matrices vectorize better elementwise).
    c00 = cov_cam[:, 0, 0]
    c01 = cov_cam[:, 0, 1]
    c02 = cov_cam[:, 0, 2]
    c11 = cov_cam[:, 1, 1]
    c12 = cov_cam[:, 1, 2]
    c22 = cov_cam[:, 2, 2]

    # Row 0 of J @ cov_cam: [j00*c00 + j02*c02, j00*c01 + j02*c12, j00*c02 + j02*c22]
    a0 = j00 * c00 + j02 * c02
    a1 = j00 * c01 + j02 * c12
    a2 = j00 * c02 + j02 * c22
    # Row 1: [j11*c01 + j12*c02, j11*c11 + j12*c12, j11*c12 + j12*c22]
    b0 = j11 * c01 + j12 * c02
    b1 = j11 * c11 + j12 * c12
    b2 = j11 * c12 + j12 * c22

    A = a0 * j00 + a2 * j02 + eps2d          # cov2d[0,0]
    B = a1 * j11 + a2 * j12                   # cov2d[0,1]
    C = b1 * j11 + b2 * j12 + eps2d          # cov2d[1,1]

    det = A * C - B * B
    valid = valid & (det > 0.0)
    det_safe = jnp.where(det > 0.0, det, 1.0)
    inv_det = 1.0 / det_safe
    conics = jnp.stack([C * inv_det, -B * inv_det, A * inv_det], axis=-1)

    # Screen radius from the max eigenvalue of cov2d (3 sigma).
    b_half = 0.5 * (A + C)
    v1 = b_half + jnp.sqrt(jnp.maximum(0.1, b_half * b_half - det_safe))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(v1, 0.0)))

    # Pixel-space centers (integer-coordinate pixel centers; equivalent to the
    # reference's projmat + ndc2pix route for symmetric frusta).
    xys = jnp.stack(
        [fx * x_c / z_safe + cx - 0.5, fy * y_c / z_safe + cy - 0.5], axis=-1
    )

    radii = jnp.where(valid, radius, 0.0).astype(dtype)
    # Zero out culled rows so downstream never sees garbage (and their
    # gradients are exactly zero).
    xys = jnp.where(valid[:, None], xys, 0.0)
    conics = jnp.where(valid[:, None], conics, 0.0)
    depths = jnp.where(valid, depths, 0.0)
    cov2d = jnp.where(valid[:, None], jnp.stack([A, B, C], axis=-1), 0.0)
    return ProjectedGaussians(xys=xys, depths=depths, conics=conics, radii=radii, cov2d=cov2d)
