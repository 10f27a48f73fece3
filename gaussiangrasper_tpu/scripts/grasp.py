"""Open-vocabulary grasp proposal from the trained field.

The GaussianGrasper paper queries the language-embedded field with CLIP
text and grasps with a normal-guided filter; the reference repo marks
that module unreleased (/root/reference/README.md:59). This implements
the pipeline end-to-end on the 3D field directly (no rendering needed):

1. lift every Gaussian's 32-d latent through the trained fea_up MLP and
   score it against the query CLIP embedding (relevancy vs canonical
   phrases, same formula as scripts/query.py);
2. keep Gaussians above --threshold, take the largest spatial cluster
   (connected components on a voxel grid);
3. propose a grasp: position = opacity-weighted centroid, approach =
   against the dominant surface normal (smallest-scale axes of the
   cluster, sign-aligned), width from the cluster's extent perpendicular
   to the approach.

Outputs a JSON grasp {position, approach, axis, width, score} and the
selected-points .ply for visualization.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from gaussiangrasper_tpu.core.transforms import quat_to_rotmat
from gaussiangrasper_tpu.models.efd import mlp_apply
from gaussiangrasper_tpu.models.model import smallest_axis_normals
from gaussiangrasper_tpu.scripts.common import load_run
from gaussiangrasper_tpu.scripts.export_pointcloud import write_ply_points


def gaussian_relevancy(fea_up_params, features, query, canonical):
    """Per-Gaussian relevancy score in [0, 1]."""
    lifted = mlp_apply(fea_up_params, features)  # (N, 512)
    f = lifted / (jnp.linalg.norm(lifted, axis=-1, keepdims=True) + 1e-8)
    q = query / (jnp.linalg.norm(query) + 1e-8)
    c = canonical / (jnp.linalg.norm(canonical, axis=-1, keepdims=True) + 1e-8)
    pos = f @ q
    negs = f @ c.T  # (N, K)
    pair = jnp.exp(pos)[:, None] / (jnp.exp(pos)[:, None] + jnp.exp(negs))
    return jnp.min(pair, axis=-1)


def largest_cluster(points: np.ndarray, voxel: float = 0.02) -> np.ndarray:
    """Mask of the largest connected voxel component (26-connectivity)."""
    if len(points) == 0:
        return np.zeros(0, bool)
    idx = np.floor(points / voxel).astype(np.int64)
    idx -= idx.min(0)
    dims = idx.max(0) + 1
    lin = np.ravel_multi_index(idx.T, dims)
    # union-find over occupied voxels
    occupied = np.unique(lin)
    vox_of = {v: i for i, v in enumerate(occupied)}
    parent = np.arange(len(occupied))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    occ3 = np.stack(np.unravel_index(occupied, dims), -1)
    occ_set = {tuple(v): i for i, v in enumerate(occ3)}
    for i, v in enumerate(occ3):
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dx == dy == dz == 0:
                        continue
                    j = occ_set.get((v[0] + dx, v[1] + dy, v[2] + dz))
                    if j is not None:
                        ra, rb = find(i), find(j)
                        if ra != rb:
                            parent[ra] = rb
    roots = np.array([find(i) for i in range(len(occupied))])
    labels = roots[np.searchsorted(occupied, lin)]
    best = np.bincount(labels).argmax()
    return labels == best


def propose_grasp(points, normals, opacities):
    """Grasp pose from a selected cluster."""
    w = opacities / (opacities.sum() + 1e-9)
    center = (points * w[:, None]).sum(0)
    # dominant surface normal: sign-align then average
    ref = normals[np.argmax(opacities)]
    aligned = normals * np.sign(normals @ ref)[:, None]
    approach = aligned.mean(0)
    approach /= np.linalg.norm(approach) + 1e-9
    # gripper closing axis: largest-variance direction perpendicular to approach
    centered = points - center
    perp = centered - np.outer(centered @ approach, approach)
    cov = perp.T @ perp / max(len(points), 1)
    vals, vecs = np.linalg.eigh(cov)
    axis = vecs[:, -1]
    extent = perp @ axis
    width = float(np.percentile(extent, 95) - np.percentile(extent, 5))
    return {
        "position": center.tolist(),
        "approach": (-approach).tolist(),  # move against the surface normal
        "axis": axis.tolist(),
        "width": width,
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Open-vocabulary grasp proposal")
    p.add_argument("--run-dir", type=Path, required=True)
    p.add_argument("--text-embedding", type=Path, required=True,
                   help=".npy (512,) CLIP text embedding of the object")
    p.add_argument("--canonical-embedding", type=Path, default=None)
    p.add_argument("--threshold", type=float, default=0.6)
    p.add_argument("--voxel", type=float, default=0.02)
    p.add_argument("--output", type=Path, default=None)
    args = p.parse_args(argv)

    config, trainer, state = load_run(args.run_dir)
    query = jnp.asarray(np.load(args.text_embedding).reshape(-1)[:512])
    canon = (np.load(args.canonical_embedding)
             if args.canonical_embedding is not None
             else np.zeros((1, 512), np.float32))

    alive = np.asarray(state.alive)
    rel = np.asarray(
        gaussian_relevancy(state.fea_up, state.field.features, query,
                           jnp.asarray(canon))
    )
    sel = alive & (rel > args.threshold)
    if not sel.any():
        raise SystemExit(
            f"no gaussians above relevancy {args.threshold} "
            f"(max {rel[alive].max():.3f})"
        )
    pts = np.asarray(state.field.means)[sel]
    cluster = largest_cluster(pts, args.voxel)
    pts = pts[cluster]
    normals = np.asarray(
        smallest_axis_normals(state.field.log_scales, state.field.quats)
    )[sel][cluster]
    opac = np.asarray(jax.nn.sigmoid(state.field.opacity_logits))[sel][cluster]

    grasp = propose_grasp(pts, normals, opac)
    grasp["score"] = float(rel[sel][cluster].mean())
    grasp["num_gaussians"] = int(cluster.sum())

    out_dir = args.output or (args.run_dir / "grasp")
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "grasp.json").write_text(json.dumps(grasp, indent=2))
    colors = np.tile([255, 64, 64], (len(pts), 1))
    write_ply_points(out_dir / "selected.ply", pts, colors)
    print(json.dumps(grasp, indent=2))


if __name__ == "__main__":
    main()
