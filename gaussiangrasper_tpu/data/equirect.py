"""Equirectangular → perspective-crop preprocessing.

Converts 360° (equirectangular) captures into a set of pinhole crops that
the normal SfM → training pipeline can consume — the counterpart of the
reference's equirect preprocessing
(/root/reference/nerfstudio/process_data/equirect_utils.py:86-158 for the
projection, :233-320 for the sampling patterns, :323-338 for the output
resolution heuristic). The reference runs the resampling through torch
grid_sample on CUDA; here it is one vectorized numpy map build + one
cv2.remap per crop (bicubic, horizontal wrap) — host-side preprocessing
does not belong on the TPU.

Conventions (matching the reference so crop sets are comparable):
  - camera looks down +x, +y right, +z up; yaw rotates about +z, pitch
    about the yawed +y axis.
  - lon ∈ [-180, 180] maps linearly onto the equirect width, lat ∈
    [-90, 90] onto its height (image row 0 = lat +90).
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np


def _axis_angle(axis: np.ndarray, theta: float) -> np.ndarray:
    """3x3 rotation about `axis` by `theta` (Euler–Rodrigues, the same
    convention as the reference's euler_rodriguez_rotation_matrix
    (equirect_utils.py:31-52), including its negated sine term)."""
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a = math.cos(theta / 2.0)
    b, c, d = -axis * math.sin(theta / 2.0)
    return np.array([
        [a * a + b * b - c * c - d * d, 2 * (b * c + a * d), 2 * (b * d - a * c)],
        [2 * (b * c - a * d), a * a + c * c - b * b - d * d, 2 * (c * d + a * b)],
        [2 * (b * d + a * c), 2 * (c * d - a * b), a * a + d * d - b * b - c * c],
    ])


def equirect_maps(
    equ_size: Tuple[int, int],
    fov_deg: float,
    yaw_deg: float,
    pitch_deg: float,
    out_size: Tuple[int, int],
) -> Tuple[np.ndarray, np.ndarray]:
    """Pixel-lookup maps (map_x, map_y) float32 (H_out, W_out) from a
    perspective crop into an equirect image of (H_eq, W_eq).

    fov_deg is the HORIZONTAL field of view; the vertical fov follows the
    aspect ratio (ref equirect2persp:109-119). Returns maps suitable for
    cv2.remap; map_x must wrap at the +-180° seam (use BORDER_WRAP).
    """
    equ_h, equ_w = equ_size
    hd, wd = out_size
    # image-plane grid at unit focal: x forward, y right, z up
    w_len = 2.0 * math.tan(math.radians(fov_deg) / 2.0)
    h_len = w_len * hd / wd
    y = (np.arange(wd, dtype=np.float64) - wd / 2.0) * (w_len / wd)
    z = -(np.arange(hd, dtype=np.float64) - hd / 2.0) * (h_len / hd)
    yy, zz = np.meshgrid(y, z)
    xyz = np.stack([np.ones_like(yy), yy, zz], axis=-1)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)

    r1 = _axis_angle(np.array([0.0, 0.0, 1.0]), math.radians(yaw_deg))
    r2 = _axis_angle(r1 @ np.array([0.0, 1.0, 0.0]), math.radians(-pitch_deg))
    xyz = xyz @ (r2 @ r1).T

    lon = np.degrees(np.arctan2(xyz[..., 1], xyz[..., 0]))
    lat = -np.degrees(np.arcsin(np.clip(xyz[..., 2], -1.0, 1.0)))
    map_x = (lon / 180.0) * (equ_w / 2.0) + equ_w / 2.0
    map_y = (lat / 90.0) * (equ_h / 2.0) + equ_h / 2.0
    return map_x.astype(np.float32), map_y.astype(np.float32)


def equirect_to_perspective(
    img: np.ndarray,
    fov_deg: float,
    yaw_deg: float,
    pitch_deg: float,
    out_size: Tuple[int, int],
) -> np.ndarray:
    """Resample one perspective crop (H_out, W_out, C) out of an equirect
    image (H, W, C). Bicubic, wrapping across the longitude seam."""
    import cv2

    map_x, map_y = equirect_maps(img.shape[:2], fov_deg, yaw_deg, pitch_deg,
                                 out_size)
    return cv2.remap(img, map_x, map_y, interpolation=cv2.INTER_CUBIC,
                     borderMode=cv2.BORDER_WRAP)


def _crop_pitch_bounds(
    bounds: List[Optional[float]], fov: float,
    crop_factor: Sequence[float],
) -> List[Optional[float]]:
    """Adjust the ascending pitch-row list for top/bottom crop factors:
    rows whose frustum is fully inside the cropped band are dropped (None),
    the first partially-covered row is shifted onto the crop boundary and
    the shift decays by halves across the remaining rows (ref
    _crop_top/_crop_bottom, equirect_utils.py:161-210)."""
    top, bottom = crop_factor[0], crop_factor[1]
    if bottom > 0:
        start = 90.0 - 180.0 * bottom - fov / 2.0
        for i in reversed(range(len(bounds))):
            el = bounds[i]
            if el is None:
                continue
            if el > start + fov / 2.0:
                bounds[i] = None
            elif el > start:
                diff = el - start
                bounds[i] = start
                for j in range(i - 1, -1, -1):
                    if bounds[j] is not None:
                        bounds[j] -= diff / (2 ** (i - j))
                break
    if top > 0:
        start = -90.0 + 180.0 * top + fov / 2.0
        for i, el in enumerate(bounds):
            if el is None:
                continue
            if el < start - fov / 2.0:
                bounds[i] = None
            elif el < start:
                diff = start - el
                bounds[i] = start
                for j in range(i + 1, len(bounds)):
                    if bounds[j] is not None:
                        bounds[j] += diff / (2 ** (j - i))
                break
    return bounds


def sampling_pattern(
    samples_per_im: int,
    crop_factor: Sequence[float] = (0.0, 0.0, 0.0, 0.0),
) -> Tuple[float, List[Tuple[float, float]]]:
    """(fov_deg, [(yaw, pitch), ...]) for the supported sample counts.

    8 crops: fov 120°, equator every 90° + ±45° rows every 180°;
    14 crops: fov 110°, equator every 60° + ±45° rows every 90°
    (ref generate_planar_projections_from_equirectangular:258-291).
    crop_factor = (top, bottom, left, right) fractions in [0, 1]; left and
    right shrink the yaw range, top and bottom adjust the pitch rows.
    """
    if any(not 0.0 <= f <= 1.0 for f in crop_factor):
        raise ValueError("crop_factor values must be in [0, 1]")
    left_bound, right_bound = -180.0, 180.0
    if crop_factor[3] > 0:
        left_bound = -180.0 + 360.0 * crop_factor[3]
    if crop_factor[2] > 0:
        right_bound = 180.0 - 360.0 * crop_factor[2]

    if samples_per_im == 8:
        fov, mid_step, pole_step = 120.0, 90.0, 180.0
    elif samples_per_im == 14:
        fov, mid_step, pole_step = 110.0, 60.0, 90.0
    else:
        raise ValueError("samples_per_im must be 8 or 14")
    low, mid, high = _crop_pitch_bounds([-45.0, 0.0, 45.0], fov, crop_factor)

    pairs: List[Tuple[float, float]] = []
    if mid is not None:
        pairs += [(y, mid) for y in np.arange(left_bound, right_bound, mid_step)]
    if high is not None:
        pairs += [(y, high) for y in np.arange(left_bound, right_bound, pole_step)]
    if low is not None:
        pairs += [(y, low) for y in np.arange(left_bound, right_bound, pole_step)]
    return fov, pairs


def crop_resolution(equ_size: Tuple[int, int], num_crops: int) -> Tuple[int, int]:
    """Square crop resolution from the pixel-count-preserving heuristic
    num_crops * res^2 = H * W (ref compute_resolution_from_equirect)."""
    res = int(math.sqrt(equ_size[0] * equ_size[1] / num_crops))
    return res, res


def generate_planar_projections(
    image_dir: Path,
    out_size: Tuple[int, int],
    samples_per_im: int,
    crop_factor: Sequence[float] = (0.0, 0.0, 0.0, 0.0),
) -> Path:
    """Write `samples_per_im` perspective crops per equirect image into
    image_dir/planar_projections/. Returns the output directory."""
    import cv2

    fov, pairs = sampling_pattern(samples_per_im, crop_factor)
    out_dir = Path(image_dir) / "planar_projections"
    out_dir.mkdir(exist_ok=True)
    n_images = 0
    for f in sorted(Path(image_dir).iterdir()):
        if f.suffix.lower() not in (".png", ".jpg", ".jpeg"):
            continue
        img = cv2.imread(str(f))
        if img is None:
            continue
        for i, (yaw, pitch) in enumerate(pairs):
            crop = equirect_to_perspective(img, fov, yaw, pitch, out_size)
            cv2.imwrite(str(out_dir / f"{f.stem}_{i}.jpg"), crop)
        n_images += 1
    if n_images == 0:
        raise SystemExit(f"no images found in {image_dir}")
    print(f"wrote {n_images * len(pairs)} planar crops "
          f"({len(pairs)}/image, fov={fov:.0f}°) -> {out_dir}")
    return out_dir
