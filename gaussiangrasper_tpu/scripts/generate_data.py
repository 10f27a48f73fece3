"""RGB-D capture -> training dataset (point cloud, normals, COLMAP model).

Role of the reference's top-level scripts/generate_data.py:410-452: from
per-frame color images, metric depth maps, and hand-eye camera poses,
build (a) a fused world point cloud with per-point color to seed the
Gaussians (depth unprojection :14-29, z-band filter :33-43, /8
subsampling :359), (b) per-pixel normal maps from depth-gradient cross
products (:204-228), (c) a COLMAP-format text model + transforms.json so
the training dataparser can consume the scene (:135-200, 351-369).

Input layout (all aligned by sorted filename stem):
  <capture>/color/*.png       RGB
  <capture>/depth/*.npy|png   metric depth (npy: meters; png: millimeters)
  <capture>/poses/*.npy       (4, 4) camera-to-world, OpenCV convention
  <capture>/intrinsics.json   {"fx", "fy", "cx", "cy", "width", "height"}

Output layout = the GaussianGrasper directory convention consumed by
data/dataset.py (images/, depths/, normals/, sparse/0/, transforms.json).
"""

from __future__ import annotations

import argparse
import json
import shutil
from pathlib import Path

import numpy as np

from gaussiangrasper_tpu.data import colmap_io as cio


def unproject_depth(depth: np.ndarray, fx, fy, cx, cy) -> np.ndarray:
    """(H, W) metric depth -> (H, W, 3) camera-frame points (OpenCV frame:
    x right, y down, z forward). Ref generate_data.py:14-29."""
    h, w = depth.shape
    ys, xs = np.mgrid[0:h, 0:w]
    x = (xs - cx) / fx * depth
    y = (ys - cy) / fy * depth
    return np.stack([x, y, depth], axis=-1)


def normals_from_depth(
    points_cam: np.ndarray, flip_towards_camera: bool = True
) -> np.ndarray:
    """Cross-product normals from neighboring unprojected points (ref
    :204-228): n = normalize((P[y,x+1]-P[y,x-1]) x (P[y+1,x]-P[y-1,x])),
    oriented towards the camera."""
    dx = np.zeros_like(points_cam)
    dy = np.zeros_like(points_cam)
    dx[:, 1:-1] = points_cam[:, 2:] - points_cam[:, :-2]
    dy[1:-1, :] = points_cam[2:, :] - points_cam[:-2, :]
    n = np.cross(dx, dy)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.maximum(norm, 1e-8)
    if flip_towards_camera:
        # camera looks down +z in OpenCV frame; normals should face it
        flip = (np.sum(n * points_cam, axis=-1, keepdims=True) > 0)
        n = np.where(flip, -n, n)
    return n.astype(np.float32)


def z_band_filter(points_w: np.ndarray, z_min: float, z_max: float) -> np.ndarray:
    """Keep points inside a world z band (ref :33-43, table-top crop)."""
    return (points_w[:, 2] > z_min) & (points_w[:, 2] < z_max)


def opencv_c2w_to_opengl(c2w: np.ndarray) -> np.ndarray:
    out = c2w.copy()
    out[:3, 1:3] *= -1.0
    return out


def icp_refine(
    src: np.ndarray,
    dst: np.ndarray,
    iterations: int = 20,
    max_corr_dist: float = 0.05,
) -> np.ndarray:
    """Point-to-point ICP aligning src onto dst; returns a 4x4 transform
    (role of the reference's colored-ICP frame alignment, generate_data.py
    :47-83 — re-implemented with scipy since open3d isn't in this image)."""
    from scipy.spatial import cKDTree

    t_total = np.eye(4)
    cur = src.copy()
    tree = cKDTree(dst)
    for _ in range(iterations):
        dist, idx = tree.query(cur, distance_upper_bound=max_corr_dist)
        ok = np.isfinite(dist)
        if ok.sum() < 10:
            break
        a = cur[ok]
        b = dst[idx[ok]]
        ca, cb = a.mean(0), b.mean(0)
        h = (a - ca).T @ (b - cb)
        u, _, vt = np.linalg.svd(h)
        d = np.sign(np.linalg.det(vt.T @ u.T))
        r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
        t = cb - r @ ca
        step = np.eye(4)
        step[:3, :3] = r
        step[:3, 3] = t
        cur = cur @ r.T + t
        t_total = step @ t_total
        if np.linalg.norm(t) < 1e-7 and np.allclose(r, np.eye(3), atol=1e-7):
            break
    return t_total


def load_depth(path: Path) -> np.ndarray:
    if path.suffix == ".npy":
        return np.load(path).astype(np.float32)
    from PIL import Image

    return np.asarray(Image.open(path)).astype(np.float32) / 1000.0


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="RGB-D capture -> training dataset")
    p.add_argument("--capture", type=Path, required=True)
    p.add_argument("--output", type=Path, required=True)
    p.add_argument("--subsample", type=int, default=8,
                   help="keep every k-th point for seeding (ref :359)")
    p.add_argument("--z-min", type=float, default=-10.0)
    p.add_argument("--z-max", type=float, default=10.0)
    p.add_argument("--depth-max", type=float, default=3.0)
    p.add_argument("--icp", action="store_true",
                   help="refine each frame's pose against the accumulated "
                        "cloud with point-to-point ICP (the reference's "
                        "colored-ICP alignment step)")
    args = p.parse_args(argv)

    cap, out = args.capture, args.output
    intr = json.loads((cap / "intrinsics.json").read_text())
    fx, fy, cx, cy = intr["fx"], intr["fy"], intr["cx"], intr["cy"]
    w, h = intr["width"], intr["height"]

    for d in ("images", "depths", "normals"):
        (out / d).mkdir(parents=True, exist_ok=True)
    sparse = out / "sparse" / "0"
    sparse.mkdir(parents=True, exist_ok=True)

    color_files = sorted((cap / "color").iterdir())
    depth_files = sorted((cap / "depth").iterdir())
    pose_files = sorted((cap / "poses").iterdir())
    assert len(color_files) == len(depth_files) == len(pose_files)

    from PIL import Image

    all_xyz, all_rgb = [], []
    frames, images_colmap = [], {}
    for i, (cf, df, pf) in enumerate(zip(color_files, depth_files, pose_files)):
        rgb = np.asarray(Image.open(cf))[..., :3]
        depth = load_depth(df)
        c2w_cv = np.load(pf)

        pts_cam = unproject_depth(depth, fx, fy, cx, cy)
        normals_cam = normals_from_depth(pts_cam)
        # rotate normals into world frame
        normals_w = normals_cam.reshape(-1, 3) @ c2w_cv[:3, :3].T
        normals_w = normals_w.reshape(normals_cam.shape)

        valid = (depth > 0.05) & (depth < args.depth_max)
        pts_w = pts_cam.reshape(-1, 3) @ c2w_cv[:3, :3].T + c2w_cv[:3, 3]
        keep = valid.reshape(-1) & z_band_filter(pts_w, args.z_min, args.z_max)
        idx = np.nonzero(keep)[0][:: args.subsample]

        if args.icp and all_xyz:
            ref_cloud = np.concatenate(all_xyz)
            t_icp = icp_refine(pts_w[idx], ref_cloud)
            c2w_cv = t_icp @ c2w_cv
            pts_w = pts_w @ t_icp[:3, :3].T + t_icp[:3, 3]
            normals_w = (normals_w.reshape(-1, 3) @ t_icp[:3, :3].T).reshape(
                normals_w.shape
            )

        all_xyz.append(pts_w[idx])
        all_rgb.append(rgb.reshape(-1, 3)[idx])

        name = f"frame_{i:05d}.png"
        Image.fromarray(rgb).save(out / "images" / name)
        np.save(out / "depths" / f"frame_{i:05d}.npy", depth)
        np.save(out / "normals" / f"frame_{i:05d}.npy", normals_w)

        c2w_gl = opencv_c2w_to_opengl(c2w_cv)
        frames.append(
            {"file_path": f"images/{name}", "transform_matrix": c2w_gl.tolist()}
        )
        # COLMAP stores world-to-camera in the OpenCV frame
        w2c = np.linalg.inv(c2w_cv)
        qvec = _rotmat_to_qvec(w2c[:3, :3])
        images_colmap[i + 1] = cio.ColmapImage(qvec, w2c[:3, 3], 1, name)

    xyz = np.concatenate(all_xyz)
    rgbs = np.concatenate(all_rgb)
    print(f"fused cloud: {len(xyz)} seed points from {len(frames)} frames")

    cio.write_cameras_text(
        sparse / "cameras.txt",
        {1: cio.ColmapCamera("PINHOLE", w, h, np.array([fx, fy, cx, cy]))},
    )
    cio.write_images_text(sparse / "images.txt", images_colmap)
    cio.write_points3d_text(sparse / "points3D.txt", xyz, rgbs)

    meta = {"fl_x": fx, "fl_y": fy, "cx": cx, "cy": cy, "w": w, "h": h,
            "frames": frames}
    (out / "transforms.json").write_text(json.dumps(meta, indent=2))
    print(f"dataset written to {out}")


def _rotmat_to_qvec(r: np.ndarray) -> np.ndarray:
    """Rotation matrix -> (w, x, y, z), numerically stable branch select."""
    tr = np.trace(r)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        return np.array([0.25 * s, (r[2, 1] - r[1, 2]) / s,
                         (r[0, 2] - r[2, 0]) / s, (r[1, 0] - r[0, 1]) / s])
    i = int(np.argmax(np.diag(r)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(r[i, i] - r[j, j] - r[k, k] + 1.0, 1e-12)) * 2
    q = np.zeros(4)
    q[0] = (r[k, j] - r[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (r[j, i] + r[i, j]) / s
    q[1 + k] = (r[k, i] + r[i, k]) / s
    return q


if __name__ == "__main__":
    main()
