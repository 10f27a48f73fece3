"""Export a textured mesh (.obj + .mtl + .png) from a trained run.

Role of the reference's exporter/texture_utils.py (`export_textured_mesh`,
`unwrap_mesh_per_uv_triangle`) wired by scripts/exporter.py's
ExportPoissonMesh/--texture path: surface the scene, give every face its
own texel-aligned UV chart, and bake texture colors by querying the
trained radiance at each texel (the reference casts rays through the
pipeline; here each texel's 3D point is projected into the training views
and sampled from the rendered RGB where the rendered depth agrees —
the same signal, one render per view instead of one ray per texel).

xatlas is absent from this image, so unwrapping uses the reference's own
fallback strategy (per-triangle charts packed on a grid,
texture_utils.unwrap_mesh_per_uv_triangle) rather than a chart optimizer.
Everything below the renders is host-side numpy.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import List, Tuple

import numpy as np


# ---------------------------------------------------------------- unwrap

def unwrap_per_triangle(
    faces: np.ndarray, cell_px: int = 16
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Assign each face its own right-triangle chart in a square grid
    (ref texture_utils.unwrap_mesh_per_uv_triangle). Returns
    (uvs (F, 3, 2) in [0,1], grid side in cells, texture side in px)."""
    f = len(faces)
    grid = int(np.ceil(np.sqrt(f)))
    tex = grid * cell_px
    cell = np.arange(f)
    cx = (cell % grid) * cell_px
    cy = (cell // grid) * cell_px
    # half-texel inset keeps bilinear samples inside the chart
    pad = 0.5
    corners = np.stack([
        np.stack([cx + pad, cy + pad], -1),
        np.stack([cx + cell_px - 1 - pad, cy + pad], -1),
        np.stack([cx + pad, cy + cell_px - 1 - pad], -1),
    ], axis=1).astype(np.float64)  # (F, 3, 2) in pixels
    return corners / tex, grid, tex


def face_texels(
    verts: np.ndarray, faces: np.ndarray, grid: int, cell_px: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """3D positions + texture pixel coords for every texel of every face
    chart. Returns (positions (F, S, 3), tex_xy (F, S, 2) int, bary mask
    (F, S) bool) with S = cell_px^2 texels per cell."""
    f = len(faces)
    lin = np.arange(cell_px * cell_px)
    lx = (lin % cell_px).astype(np.float64)   # texel offsets in the cell
    ly = (lin // cell_px).astype(np.float64)
    # barycentric coords of the chart's right triangle. The UV corners sit
    # at texel CENTERS 0 and cell_px-2 (half-texel inset on both sides,
    # see unwrap_per_triangle), so b=1 must land on texel cell_px-2.
    b1 = lx / (cell_px - 2)
    b2 = ly / (cell_px - 2)
    inside = b1 + b2 <= 1.0 + 1e-9
    b0 = 1.0 - b1 - b2

    tri = verts[faces]  # (F, 3, 3)
    pos = (
        b0[None, :, None] * tri[:, 0:1, :]
        + b1[None, :, None] * tri[:, 1:2, :]
        + b2[None, :, None] * tri[:, 2:3, :]
    )  # (F, S, 3)

    cell = np.arange(f)
    cx = (cell % grid) * cell_px
    cy = (cell // grid) * cell_px
    tex_xy = np.stack(
        [cx[:, None] + lx[None, :], cy[:, None] + ly[None, :]], -1
    ).astype(np.int64)
    return pos, tex_xy, np.broadcast_to(inside, (f, len(lin)))


# ------------------------------------------------------------------ bake

def bake_from_views(
    positions: np.ndarray,       # (M, 3) world points
    normals: np.ndarray,         # (M, 3) face normals at those points
    view_images: List[np.ndarray],   # rendered rgb (H, W, 3) per view
    view_depths: List[np.ndarray],   # rendered depth (H, W) per view
    cameras,                     # list of core.cameras.Camera
    depth_eps: float = 0.05,
) -> np.ndarray:
    """Pick, per point, the most front-facing training view whose rendered
    depth agrees with the point (visibility), and sample its RGB
    (the reference bakes by re-querying the field per texel;
    exporter/texture_utils.py)."""
    m = len(positions)
    best_score = np.full(m, -np.inf)
    out = np.full((m, 3), 0.5, np.float64)
    for img, dep, cam in zip(view_images, view_depths, cameras):
        c2w = np.asarray(cam.camera_to_world, np.float64)
        r, t = c2w[:3, :3], c2w[:3, 3]
        p_cam = (positions - t) @ r  # world -> camera (OpenGL)
        z = -p_cam[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            x = np.asarray(cam.fx) * p_cam[:, 0] / np.maximum(z, 1e-9) + np.asarray(cam.cx)
            y = -np.asarray(cam.fy) * p_cam[:, 1] / np.maximum(z, 1e-9) + np.asarray(cam.cy)
        h, w = dep.shape
        xi = np.clip(x, 0, w - 1)
        yi = np.clip(y, 0, h - 1)
        in_img = (z > 1e-6) & (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
        d_r = dep[yi.astype(int), xi.astype(int)]
        visible = in_img & (np.abs(d_r - z) < depth_eps * np.maximum(z, 1.0))
        view_dir = positions - t
        view_dir /= np.maximum(np.linalg.norm(view_dir, axis=1, keepdims=True), 1e-9)
        score = -np.sum(view_dir * normals, axis=1)  # front-facing > 0
        score = np.where(visible, score, -np.inf)
        take = score > best_score
        if take.any():
            # bilinear sample
            x0 = np.floor(xi).astype(int)
            y0 = np.floor(yi).astype(int)
            x1 = np.minimum(x0 + 1, w - 1)
            y1 = np.minimum(y0 + 1, h - 1)
            fx = (xi - x0)[:, None]
            fy = (yi - y0)[:, None]
            c = (
                img[y0, x0] * (1 - fx) * (1 - fy)
                + img[y0, x1] * fx * (1 - fy)
                + img[y1, x0] * (1 - fx) * fy
                + img[y1, x1] * fx * fy
            )
            out[take] = c[take]
            best_score[take] = score[take]
    return np.clip(out, 0.0, 1.0)


def face_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    tri = verts[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    return n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)


# ----------------------------------------------------------------- write

def write_obj(
    out_dir: Path, name: str,
    verts: np.ndarray, faces: np.ndarray, uvs: np.ndarray,
    texture: np.ndarray,
) -> Path:
    """Write mesh.obj + mesh.mtl + texture png (the reference's
    export_textured_mesh output convention)."""
    out_dir.mkdir(parents=True, exist_ok=True)
    from PIL import Image

    Image.fromarray((texture * 255).astype(np.uint8)).save(
        out_dir / f"{name}.png"
    )
    (out_dir / f"{name}.mtl").write_text(
        f"newmtl {name}\nKd 1.0 1.0 1.0\nmap_Kd {name}.png\n"
    )
    lines = [f"mtllib {name}.mtl", f"usemtl {name}"]
    for v in verts:
        lines.append(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}")
    for fuv in uvs:  # (3, 2) per face; v origin bottom-left in OBJ
        for uv in fuv:
            lines.append(f"vt {uv[0]:.6f} {1.0 - uv[1]:.6f}")
    for i, f in enumerate(faces):
        t = 3 * i
        lines.append(
            f"f {f[0] + 1}/{t + 1} {f[1] + 1}/{t + 2} {f[2] + 1}/{t + 3}"
        )
    path = out_dir / f"{name}.obj"
    path.write_text("\n".join(lines) + "\n")
    return path


def bake_mesh_texture(
    verts: np.ndarray, faces: np.ndarray,
    view_images, view_depths, cameras,
    cell_px: int = 16,
) -> Tuple[np.ndarray, np.ndarray]:
    """Unwrap + bake. Returns (uvs (F,3,2), texture (S,S,3) float)."""
    uvs, grid, tex = unwrap_per_triangle(faces, cell_px)
    pos, tex_xy, inside = face_texels(verts, faces, grid, cell_px)
    normals = face_normals(verts, faces)
    m = pos.reshape(-1, 3)
    n = np.repeat(normals, pos.shape[1], axis=0)
    colors = bake_from_views(m, n, view_images, view_depths, cameras)
    texture = np.full((tex, tex, 3), 0.5)
    xy = tex_xy.reshape(-1, 2)
    keep = inside.reshape(-1)
    texture[xy[keep, 1], xy[keep, 0]] = colors[keep]
    return uvs, texture


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="Bake a textured mesh from a trained run "
                    "(ref exporter.py --texture path)"
    )
    p.add_argument("--run", type=Path, required=True)
    p.add_argument("--output", type=Path, required=True)
    p.add_argument("--name", type=str, default="mesh")
    p.add_argument("--resolution", type=int, default=128,
                   help="TSDF voxel resolution")
    p.add_argument("--cell-px", type=int, default=16,
                   help="texels per face chart edge")
    p.add_argument("--max-views", type=int, default=16)
    p.add_argument("--max-depth", type=float, default=6.0)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from gaussiangrasper_tpu.models.model import render as render_fn
    from gaussiangrasper_tpu.scripts.common import load_run
    from gaussiangrasper_tpu.scripts.export_pointcloud import TSDFVolume

    config, trainer, state = load_run(args.run)
    dm = trainer.dm

    views, depths, cams = [], [], []
    idxs = np.linspace(0, len(dm) - 1, min(args.max_views, len(dm)), dtype=int)
    for i in idxs:
        cam, _ = dm.get_batch(int(i))
        out = render_fn(state.field, state.alive, cam, state.step, config.model)
        views.append(np.clip(np.asarray(out["rgb"]), 0, 1))
        depths.append(np.asarray(out["depth"][..., 0]))
        cams.append(cam)

    # scene bounds from rendered geometry
    pts = []
    from gaussiangrasper_tpu.scripts.export_pointcloud import unproject_view

    for img, dep, cam in zip(views, depths, cams):
        xyz, _ = unproject_view(dep, img, cam, args.max_depth)
        pts.append(xyz)
    pts = np.concatenate(pts)
    lo, hi = pts.min(0) - 0.05, pts.max(0) + 0.05
    vol = TSDFVolume(np.stack([lo, hi]), resolution=args.resolution)
    for dep, cam in zip(depths, cams):
        vol.integrate(dep, cam)
    verts, faces = vol.extract_mesh()
    print(f"mesh: {len(verts)} verts, {len(faces)} faces")

    uvs, texture = bake_mesh_texture(
        verts, faces, views, depths, cams, cell_px=args.cell_px
    )
    path = write_obj(args.output, args.name, verts, faces, uvs, texture)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
