"""Scene update: move an object's Gaussians, then fine-tune.

Role of the reference GaussianEditer (/root/reference/nerfstudio/scripts/
update.py:92-369, update.sh): load a trained run, select the Gaussians
inside the convex hull of an edited-object point cloud (Delaunay
find_simplex with IQR outlier rejection, ref :293-328), rigid-transform
their means and quats (ref transformed_gs :217-240), save as a step-0
checkpoint, and re-enter the training loop for a short fine-tune on the
`after_updating` capture with the reference's modified refine
hyperparameters (580 iters, warmup 300, densify_grad_thresh 1e-3,
refine_every 200 — ref :165-177).

The object's rigid move is given either as a 4x4 matrix (--transform-npy)
or as two 6-dof poses (--pose-before/--pose-after, xyzrxryrz rotvec) from
which T = T_after @ T_before^-1 (ref prepare_transform :346-358).
"""

from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from gaussiangrasper_tpu.core.transforms import quat_to_rotmat, rotmat_to_quat
from gaussiangrasper_tpu.engine import checkpoint as ckpt
from gaussiangrasper_tpu.engine.trainer import Trainer, make_trainer
from gaussiangrasper_tpu.scripts.common import load_run


def points_inside_convex_hull(
    points: np.ndarray,
    hull_points: np.ndarray,
    remove_outliers: bool = True,
    outlier_factor: float = 1.0,
) -> np.ndarray:
    """Mask of `points` inside the convex hull of `hull_points` (ref
    :293-328: percentile-IQR outlier filter + Delaunay.find_simplex)."""
    from scipy.spatial import Delaunay

    if remove_outliers:
        q1 = np.percentile(hull_points, 0, axis=0)
        q3 = np.percentile(hull_points, 80, axis=0)
        iqr = q3 - q1
        bad = (hull_points < (q1 - outlier_factor * iqr)) | (
            hull_points > (q3 + outlier_factor * iqr)
        )
        hull_points = hull_points[~np.any(bad, axis=1)]
    tri = Delaunay(hull_points)
    return tri.find_simplex(points) >= 0


def rigid_transform_gaussians(field, mask: np.ndarray, transform: np.ndarray):
    """Apply a rigid transform to the masked subset (ref transformed_gs
    :217-240): means' = R m + t; quat' = quat(R @ R(quat))."""
    r = jnp.asarray(transform[:3, :3], jnp.float32)
    t = jnp.asarray(transform[:3, 3], jnp.float32)
    m = jnp.asarray(mask)
    new_means = jnp.where(m[:, None], field.means @ r.T + t, field.means)
    rots = quat_to_rotmat(field.quats)
    new_quats_all = rotmat_to_quat(jnp.einsum("ij,njk->nik", r, rots))
    new_quats = jnp.where(m[:, None], new_quats_all, field.quats)
    return field._replace(means=new_means, quats=new_quats)


def pose_to_matrix(vec: np.ndarray) -> np.ndarray:
    """6-dof (x y z rx ry rz) rotvec pose -> 4x4."""
    from scipy.spatial.transform import Rotation

    m = np.eye(4)
    m[:3, :3] = Rotation.from_rotvec(vec[3:]).as_matrix()
    m[:3, 3] = vec[:3]
    return m


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Edit a trained scene and fine-tune")
    p.add_argument("--run-dir", type=Path, required=True)
    p.add_argument("--edit-object", type=Path, required=True,
                   help=".npy/.txt (N,3+) object points in capture frame")
    p.add_argument("--transform-npy", type=Path, default=None,
                   help="4x4 rigid move of the object, capture frame")
    p.add_argument("--pose-before", type=float, nargs=6, default=None)
    p.add_argument("--pose-after", type=float, nargs=6, default=None)
    p.add_argument("--after-data", type=Path, default=None,
                   help="post-move capture dir (default <data>/../after_updating)")
    p.add_argument("--max-iterations", type=int, default=580)
    p.add_argument("--mesh", type=str, default=None,
                   help="'dp,gauss' device mesh: run the fine-tune through "
                        "the sharded host loop (BASELINE config 5 — the "
                        "scene-update workload on a multi-chip slice; the "
                        "reference re-enters its DDP-capable train_loop, "
                        "ref update.py:163-177)")
    p.add_argument("--tile-shard", type=str, default="auto",
                   choices=("auto", "on", "off"),
                   help="with --mesh: distribute each camera's compositing "
                        "over the gauss axis (auto = on when gauss > 1)")
    args = p.parse_args(argv)

    config, trainer, state = load_run(args.run_dir)
    dm = trainer.dm
    world_t = np.eye(4)
    world_t[:3] = dm.outputs.dataparser_transform
    scale = dm.outputs.dataparser_scale

    # object points: capture frame -> oriented/scaled world frame (ref :148-150)
    if args.edit_object.suffix == ".npy":
        obj = np.load(args.edit_object)[:, :3]
    else:
        obj = np.loadtxt(args.edit_object)[:, :3]
    obj_w = (obj @ world_t[:3, :3].T + world_t[:3, 3]) * scale

    # rigid move: capture frame -> world frame conjugation (ref :152-156)
    if args.transform_npy is not None:
        move = np.load(args.transform_npy)
    elif args.pose_before is not None and args.pose_after is not None:
        move = pose_to_matrix(np.array(args.pose_after)) @ np.linalg.inv(
            pose_to_matrix(np.array(args.pose_before))
        )
    else:
        raise SystemExit("give --transform-npy or --pose-before/--pose-after")
    move_w = world_t @ move @ np.linalg.inv(world_t)
    move_w[:3, 3] *= scale

    means = np.asarray(state.field.means)
    alive = np.asarray(state.alive)
    mask = points_inside_convex_hull(means, obj_w) & alive
    assert mask.sum() > 0, "no gaussians inside the edited-object hull"
    print(f"transforming {int(mask.sum())} / {int(alive.sum())} gaussians")

    field = rigid_transform_gaussians(state.field, mask, move_w)
    state = state._replace(field=field, step=jnp.asarray(0, jnp.int32))

    # fine-tune on the post-move capture (ref :163-177)
    edit_dir = args.run_dir / "edit"
    ckpt.save_checkpoint(edit_dir / "checkpoints", state, step=0,
                         keep_only_latest=False)

    ft_config = dataclasses.replace(
        config,
        data=args.after_data or (Path(config.data).parent / "after_updating"),
        max_iterations=args.max_iterations,
        output_dir=edit_dir,
        experiment_name="finetune",
        model=dataclasses.replace(
            config.model,
            warmup_length=300,
            densify_grad_thresh=1e-3,
            refine_every=200,
        ),
    )
    ft_trainer = make_trainer(ft_config)
    ft_trainer.setup()
    ft_trainer.state = state
    if args.mesh:
        from gaussiangrasper_tpu.parallel.host_loop import train_sharded

        dp, gauss = (int(x) for x in args.mesh.split(","))
        tile_shard = (None if args.tile_shard == "auto"
                      else args.tile_shard == "on")
        state = train_sharded(ft_trainer, dp=dp, gauss=gauss,
                              tile_shard=tile_shard)
    else:
        state = ft_trainer.train()
    # keep the step-0 pre-finetune state too (the reference sets
    # save_only_latest_checkpoint=False for the edit flow, update.py:166)
    path = ckpt.save_checkpoint(edit_dir / "checkpoints", state,
                                step=9999999, keep_only_latest=False)
    print(f"edited scene saved to {path}")


if __name__ == "__main__":
    main()
