"""Ray primitives + per-camera ray generation.

Role of the reference's RayBundle/RaySamples (/root/reference/nerfstudio/
cameras/rays.py:33-295) and Cameras.generate_rays (cameras/cameras.py:317)
for the ray-marched (NeRF-family) models. Pytrees of arrays, fully
vmappable; the Gaussian-splatting path never touches these.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gaussiangrasper_tpu.core.cameras import Camera


class RayBundle(NamedTuple):
    origins: jax.Array       # (..., 3)
    directions: jax.Array    # (..., 3) unit
    pixel_area: jax.Array    # (..., 1)
    nears: Optional[jax.Array] = None
    fars: Optional[jax.Array] = None


class RaySamples(NamedTuple):
    positions: jax.Array    # (..., S, 3)
    directions: jax.Array   # (..., S, 3)
    starts: jax.Array       # (..., S, 1) bin starts along ray
    ends: jax.Array         # (..., S, 1)

    @property
    def deltas(self) -> jax.Array:
        return self.ends - self.starts


VR_IPD = 0.064
"""Interpupillary distance in meters for the stereo camera models
(ref cameras.py:690: scene scale must be true to life)."""


def undistort_coords(
    dx: jax.Array, dy: jax.Array, distortion: jax.Array, iters: int = 10
) -> Tuple[jax.Array, jax.Array]:
    """Iteratively invert the OpenCV radial(k1..k4)+tangential(p1,p2) model
    on normalized-plane coordinates (the reference's
    camera_utils.radial_and_tangential_undistort, used per-ray at
    cameras.py:645-648; Newton steps on the residual)."""
    k1, k2, k3, k4, p1, p2 = (distortion[i] for i in range(6))

    def residual(xu, yu):
        r2 = xu * xu + yu * yu
        d = 1.0 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
        fx = d * xu + 2 * p1 * xu * yu + p2 * (r2 + 2 * xu * xu) - dx
        fy = d * yu + 2 * p2 * xu * yu + p1 * (r2 + 2 * yu * yu) - dy
        return fx, fy

    def newton(_, xy):
        xu, yu = xy
        fx, fy = residual(xu, yu)
        # numerical Jacobian by forward differences (matches the reference)
        eps = 1e-6
        fx_x, fy_x = residual(xu + eps, yu)
        fx_y, fy_y = residual(xu, yu + eps)
        a, b = (fx_x - fx) / eps, (fx_y - fx) / eps
        c, d = (fy_x - fy) / eps, (fy_y - fy) / eps
        det = a * d - b * c
        det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
        return (xu - (d * fx - b * fy) / det, yu - (-c * fx + a * fy) / det)

    xu, yu = jax.lax.fori_loop(0, iters, newton, (dx, dy))
    return xu, yu


def generate_rays(
    camera: Camera,
    coords: Optional[jax.Array] = None,
    camera_type: str = "perspective",
    distortion: Optional[jax.Array] = None,
) -> RayBundle:
    """Rays through pixel centers. coords: (..., 2) integer (row, col);
    default = the full image grid. OpenGL convention: camera looks down
    -z, y up (matches the reference's directions stack at cameras.py:748).

    camera_type mirrors the reference's CameraType ray branches
    (cameras.py:501-880): "perspective", "fisheye" (equidistant: the
    normalized-plane radius is the angle from the optical axis),
    "equirectangular" (pixel grid = (longitude, latitude)),
    "omnidirectional_l"/"omnidirectional_r" (ODS: equirect directions with
    ray origins on an IPD/2 circle, ref :664-720), and
    "vr180_l"/"vr180_r" (half-sphere directions with a fixed horizontal
    eye offset, ref :723-780).

    distortion: optional (6,) OpenCV params (k1 k2 k3 k4 p1 p2) inverted
    per ray for the perspective/fisheye models (ref cameras.py:640-648;
    not applied to the panoramic models, same as the reference).
    """
    if coords is None:
        ys, xs = jnp.mgrid[0 : camera.height, 0 : camera.width]
        coords = jnp.stack([ys, xs], axis=-1)
    y = coords[..., 0].astype(jnp.float32) + 0.5
    x = coords[..., 1].astype(jnp.float32) + 0.5
    r = camera.camera_to_world[:3, :3]
    origin = camera.camera_to_world[:3, 3]

    if camera_type in ("omnidirectional_l", "omnidirectional_r",
                       "vr180_l", "vr180_r"):
        # coord = normalized-plane coordinates, like the reference's
        # coord_stack (cameras.py:683-686, 737-741)
        cu = (x - camera.cx) / camera.fx
        cv = (y - camera.cy) / camera.fy
        right = camera_type.endswith("_r")
        is_vr180 = camera_type.startswith("vr180")
        theta = -jnp.pi * (cu / 2.0 if is_vr180 else cu)
        phi = jnp.pi * (0.5 - cv)
        dirs_cam = jnp.stack(
            [-jnp.sin(theta) * jnp.sin(phi), jnp.cos(phi),
             -jnp.cos(theta) * jnp.sin(phi)], axis=-1,
        )
        side = 1.0 if right else -1.0
        if is_vr180:
            # fixed horizontal interocular offset (ref :757-760)
            local = jnp.stack(
                [jnp.full_like(theta, side * VR_IPD / 2.0),
                 jnp.zeros_like(theta), jnp.zeros_like(theta)], axis=-1,
            )
        else:
            # circle of ODS ray origins in the local x / -z plane (ref :705-710)
            local = jnp.stack(
                [side * (VR_IPD / 2.0) * jnp.cos(theta),
                 jnp.zeros_like(theta),
                 -side * (VR_IPD / 2.0) * jnp.sin(theta)], axis=-1,
            )
        dirs = dirs_cam @ r.T
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        origins = local @ r.T + origin
        pixel_area = jnp.broadcast_to(
            1.0 / (camera.fx * camera.fy), dirs[..., :1].shape
        )
        return RayBundle(origins=origins, directions=dirs,
                         pixel_area=pixel_area)

    if camera_type == "equirectangular":
        # longitude in [-pi, pi], latitude in [-pi/2, pi/2] over the image
        lon = (x / camera.width - 0.5) * (2.0 * jnp.pi)
        lat = -(y / camera.height - 0.5) * jnp.pi
        dirs_cam = jnp.stack(
            [jnp.cos(lat) * jnp.sin(lon), jnp.sin(lat),
             -jnp.cos(lat) * jnp.cos(lon)], axis=-1,
        )
    else:
        dx = (x - camera.cx) / camera.fx
        dy = -(y - camera.cy) / camera.fy
        if distortion is not None:
            dx, dy = undistort_coords(dx, dy, jnp.asarray(distortion))
        if camera_type == "fisheye":
            theta = jnp.sqrt(dx * dx + dy * dy)  # angle from optical axis
            theta = jnp.clip(theta, 1e-9, jnp.pi)
            sin_over_r = jnp.sin(theta) / theta
            dirs_cam = jnp.stack(
                [dx * sin_over_r, dy * sin_over_r, -jnp.cos(theta)], axis=-1,
            )
        else:
            dirs_cam = jnp.stack([dx, dy, -jnp.ones_like(dx)], axis=-1)
    dirs = dirs_cam @ r.T
    norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs / norm
    origins = jnp.broadcast_to(origin, dirs.shape)
    pixel_area = jnp.broadcast_to(
        1.0 / (camera.fx * camera.fy), dirs[..., :1].shape
    )
    return RayBundle(origins=origins, directions=dirs, pixel_area=pixel_area)


def sample_along_rays(
    bundle: RayBundle,
    near: float,
    far: float,
    num_samples: int,
    key: Optional[jax.Array] = None,
    stratified: bool = True,
) -> RaySamples:
    """Uniform (optionally stratified/jittered) samples (the reference's
    UniformSampler, model_components/ray_samplers.py)."""
    t = jnp.linspace(0.0, 1.0, num_samples + 1)
    bins = near + (far - near) * t  # (S+1,)
    shape = bundle.origins.shape[:-1]
    starts = jnp.broadcast_to(bins[:-1], shape + (num_samples,))
    ends = jnp.broadcast_to(bins[1:], shape + (num_samples,))
    if stratified and key is not None:
        jitter = jax.random.uniform(key, starts.shape)
        mids = starts + (ends - starts) * jitter
    else:
        mids = 0.5 * (starts + ends)
    pos = (
        bundle.origins[..., None, :]
        + bundle.directions[..., None, :] * mids[..., None]
    )
    dirs = jnp.broadcast_to(bundle.directions[..., None, :], pos.shape)
    return RaySamples(
        positions=pos, directions=dirs,
        starts=starts[..., None], ends=ends[..., None],
    )


def sample_pdf(
    bins: jax.Array,       # (..., S+1) existing bin edges
    weights: jax.Array,    # (..., S) weights from a coarse pass
    num_samples: int,
    key: jax.Array,
) -> jax.Array:
    """Inverse-CDF resampling (the reference's PDFSampler,
    ray_samplers.py — hierarchical NeRF sampling). Returns (..., N) ts."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.concatenate(
        [jnp.zeros_like(pdf[..., :1]), jnp.cumsum(pdf, axis=-1)], axis=-1
    )
    u = jax.random.uniform(key, cdf.shape[:-1] + (num_samples,))
    idx = jnp.sum((u[..., None, :] >= cdf[..., :, None]).astype(jnp.int32), axis=-2)
    below = jnp.clip(idx - 1, 0, cdf.shape[-1] - 1)
    above = jnp.clip(idx, 0, cdf.shape[-1] - 1)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bin_b = jnp.take_along_axis(bins, below, axis=-1)
    bin_a = jnp.take_along_axis(bins, above, axis=-1)
    denom = jnp.where(cdf_a - cdf_b < 1e-8, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return bin_b + t * (bin_a - bin_b)


def render_weights(densities: jax.Array, deltas: jax.Array) -> jax.Array:
    """Volumetric rendering weights w_i = T_i (1 - exp(-sigma_i d_i))
    (the reference's RaySamples.get_weights, rays.py:107-190)."""
    alpha = 1.0 - jnp.exp(-densities * deltas)
    trans = jnp.exp(
        -jnp.concatenate(
            [jnp.zeros_like(densities[..., :1, :]),
             jnp.cumsum(densities * deltas, axis=-2)[..., :-1, :]],
            axis=-2,
        )
    )
    return alpha * trans


def composite(
    weights: jax.Array, values: jax.Array, background: Optional[jax.Array] = None
) -> jax.Array:
    """Weighted sum along the sample axis with optional background blend
    (the reference's RGBRenderer, model_components/renderers.py)."""
    out = jnp.sum(weights * values, axis=-2)
    if background is not None:
        acc = jnp.sum(weights, axis=-2)
        out = out + (1.0 - acc) * background
    return out
