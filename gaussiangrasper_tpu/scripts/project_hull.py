"""Project an edited object's 3D points into every view -> finetune masks.

Role of the reference's scripts/project_hull.py:21-125 (scene-update prep):
for each training view, project the object's 3D points (before AND after
the move) into the image, take the convex hull of the projected points,
rasterize it to a mask, dilate, and save per-view masks that restrict the
post-edit fine-tune loss to the changed region.

Inputs are in the capture (COLMAP/OpenCV) frame, like the update tool.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def project_points(
    pts_w: np.ndarray, w2c: np.ndarray, fx, fy, cx, cy
) -> np.ndarray:
    """World points -> pixel coords via an OpenCV-convention w2c (ref
    project_hull.py:21-45). Points behind the camera are dropped."""
    p_cam = pts_w @ w2c[:3, :3].T + w2c[:3, 3]
    z = p_cam[:, 2]
    keep = z > 1e-6
    p = p_cam[keep]
    return np.stack([fx * p[:, 0] / p[:, 2] + cx, fy * p[:, 1] / p[:, 2] + cy], -1)


def hull_mask(uv: np.ndarray, width: int, height: int, dilate: int = 15) -> np.ndarray:
    """Filled convex hull of projected points, dilated (ref :64-125)."""
    import cv2

    mask = np.zeros((height, width), np.uint8)
    if len(uv) >= 3:
        pts = np.round(uv).astype(np.int32)
        hull = cv2.convexHull(pts)
        cv2.fillConvexPoly(mask, hull, 1)
    if dilate > 0:
        kernel = np.ones((dilate, dilate), np.uint8)
        mask = cv2.dilate(mask, kernel)
    return mask.astype(bool)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="Build per-view edit-region masks for scene-update finetuning"
    )
    p.add_argument("--data", type=Path, required=True,
                   help="scene dir (COLMAP or transforms.json)")
    p.add_argument("--edit-object", type=Path, required=True)
    p.add_argument("--transform-npy", type=Path, required=True,
                   help="4x4 rigid move (capture frame)")
    p.add_argument("--output", type=Path, default=None,
                   help="mask dir (default <data>/boundary_mask)")
    p.add_argument("--dilate", type=int, default=15)
    args = p.parse_args(argv)

    from gaussiangrasper_tpu.engine.trainer import make_trainer, TrainerConfig

    # reuse the parser auto-detection only; no training state needed
    from gaussiangrasper_tpu.data.dataparsers.colmap import ColmapDataParser
    from gaussiangrasper_tpu.data.dataparsers.transforms_json import TransformsJsonParser

    data = Path(args.data)
    if (data / "transforms.json").exists():
        outputs = TransformsJsonParser(data).parse()
    else:
        outputs = ColmapDataParser(data).parse()

    obj = (np.load(args.edit_object) if args.edit_object.suffix == ".npy"
           else np.loadtxt(args.edit_object))[:, :3]
    move = np.load(args.transform_npy)
    obj_after = obj @ move[:3, :3].T + move[:3, 3]

    out_dir = args.output or (data / "boundary_mask")
    out_dir.mkdir(parents=True, exist_ok=True)

    # cameras are stored OpenGL c2w in the ORIENTED world frame; object
    # points are capture-frame -> transform them the same way the parser
    # transformed the cameras, then invert each pose (OpenCV frame for
    # projection).
    wt = np.eye(4)
    wt[:3] = outputs.dataparser_transform
    s = outputs.dataparser_scale
    both = np.concatenate([obj, obj_after])
    both_w = (both @ wt[:3, :3].T + wt[:3, 3]) * s

    for i, (cam, img_path) in enumerate(zip(outputs.cameras, outputs.image_filenames)):
        c2w = np.eye(4)
        c2w[:3] = cam.camera_to_world
        c2w[:3, 1:3] *= -1.0  # OpenGL -> OpenCV
        w2c = np.linalg.inv(c2w)
        uv = project_points(both_w, w2c, cam.fx, cam.fy, cam.cx, cam.cy)
        mask = hull_mask(uv, cam.width, cam.height, args.dilate)
        np.save(out_dir / f"{img_path.stem}.npy", mask)
    print(f"wrote {len(outputs.cameras)} masks to {out_dir}")


if __name__ == "__main__":
    main()
