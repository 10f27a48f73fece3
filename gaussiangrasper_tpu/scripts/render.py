"""Offline render-out of rgb / CLIP-feature / normal / depth maps.

Role of the reference's eval.py + the repurposed
get_average_eval_image_metrics (/root/reference/nerfstudio/pipelines/
base_pipeline.py:370-426 via render.sh): for up to --num-views train
views, write
  rgb/<i>.png
  clip/<i>_fea.npy    — fea_up-lifted 512-d CLIP map
  normal/<i>.npy/.png — rotated back to the capture frame by the inverse
                        dataparser transform (ref :410-411)
  depth/<i>.npy/.png  — metric (divided by dataparser scale), JET colormap
plus a metrics json (psnr/ssim/depth/normal per view).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from gaussiangrasper_tpu.models import losses
from gaussiangrasper_tpu.models.efd import mlp_apply
from gaussiangrasper_tpu.models.model import render as render_fn
from gaussiangrasper_tpu.scripts.common import load_run


def depth2color(depth: np.ndarray) -> np.ndarray:
    """JET colormap on normalized depth (ref base_pipeline.py:58-64)."""
    import cv2

    d = depth - depth.min()
    d = d / (d.max() + 1e-8)
    return cv2.applyColorMap((d * 255).astype(np.uint8), cv2.COLORMAP_JET)[..., ::-1]


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Render eval maps from a trained run")
    p.add_argument("--run-dir", type=Path, required=True)
    p.add_argument("--output", type=Path, default=None)
    p.add_argument("--num-views", type=int, default=16)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--data", type=Path, default=None,
                   help="evaluate against THIS capture instead of the "
                        "training one (held-out eval views — the "
                        "reference's eval-split metrics flow, ref "
                        "pipelines/base_pipeline.py:370-426)")
    p.add_argument("--traj", choices=("dataset", "interpolate", "spiral"),
                   default="dataset",
                   help="dataset views (with metrics) or a camera-path "
                        "trajectory (rgb only, ref render.py camera paths)")
    args = p.parse_args(argv)

    from PIL import Image

    config, trainer, state = load_run(args.run_dir, step=args.step,
                                      data_override=args.data)
    out_dir = args.output or (args.run_dir / "renders")
    for sub in ("rgb", "clip", "normal", "depth"):
        (out_dir / sub).mkdir(parents=True, exist_ok=True)

    dm = trainer.dm
    scale = dm.outputs.dataparser_scale
    inv_rot = np.linalg.inv(dm.outputs.dataparser_transform[:3, :3])

    render_jit = jax.jit(
        lambda f, a, c: render_fn(f, a, c, state.step, config.model),
    )

    if args.traj != "dataset":
        from gaussiangrasper_tpu.core.camera_paths import interpolate_path, spiral_path
        from gaussiangrasper_tpu.core.cameras import Camera

        if args.traj == "interpolate":
            path = interpolate_path(dm.cameras, steps_per_transition=6)
        else:
            path = spiral_path(dm.cameras[0], n_frames=args.num_views)
        (out_dir / "traj").mkdir(parents=True, exist_ok=True)
        for i, pc in enumerate(path):
            cam = Camera.create(pc.fx, pc.fy, pc.cx, pc.cy,
                                pc.camera_to_world, pc.width, pc.height)
            outs = render_jit(state.field, state.alive, cam)
            rgb = np.asarray(jnp.clip(outs["rgb"], 0, 1))
            Image.fromarray((rgb * 255).astype(np.uint8)).save(
                out_dir / "traj" / f"{i:05d}.png"
            )
        print(f"rendered {len(path)} trajectory frames to {out_dir / 'traj'}")
        return

    results = []
    n = min(args.num_views, len(dm))
    for i in range(n):
        cam, batch = dm.get_batch(i)
        outs = render_jit(state.field, state.alive, cam)
        rgb = np.asarray(jnp.clip(outs["rgb"], 0, 1))
        Image.fromarray((rgb * 255).astype(np.uint8)).save(out_dir / "rgb" / f"{i:05d}.png")

        # fea_up lift to CLIP space (ref :408)
        fea = outs["feature"]
        clip_map = mlp_apply(state.fea_up, fea.reshape(-1, fea.shape[-1]))
        clip_map = np.asarray(clip_map).reshape(fea.shape[0], fea.shape[1], -1)
        np.save(out_dir / "clip" / f"{i:05d}_fea.npy", clip_map.astype(np.float16))

        normal = np.asarray(outs["normal"]) @ inv_rot.T  # back to capture frame
        np.save(out_dir / "normal" / f"{i:05d}.npy", normal)
        Image.fromarray(((normal * 0.5 + 0.5) * 255).clip(0, 255).astype(np.uint8)).save(
            out_dir / "normal" / f"{i:05d}.png"
        )

        depth = np.asarray(outs["depth"][..., 0]) / scale  # metric (ref :405)
        np.save(out_dir / "depth" / f"{i:05d}.npy", depth)
        Image.fromarray(depth2color(depth)).save(out_dir / "depth" / f"{i:05d}.png")

        gt = np.asarray(batch["image"])
        row = {
            "view": i,
            "psnr": float(losses.psnr(jnp.asarray(rgb), jnp.asarray(gt))),
            "ssim": float(losses.ssim(jnp.asarray(rgb), jnp.asarray(gt))),
        }
        # masked PSNR for mask-gated captures: training supervises only
        # valid_mask pixels (ref get_loss_dict masks the L1), so the
        # full-image psnr above is dragged by unsupervised regions
        vm = np.asarray(batch.get("valid_mask", np.ones(gt.shape[:2], bool)))
        if not vm.all():
            row["psnr_masked"] = float(losses.psnr(
                jnp.asarray(rgb), jnp.asarray(gt), jnp.asarray(vm)))
        # lpips is weight-gated (utils/perceptual.py): present only when a
        # VGG backbone is cached locally (the reference's torchmetrics
        # LPIPS needs the same download)
        from gaussiangrasper_tpu.utils import perceptual

        lp = perceptual.lpips(rgb, gt)
        if lp is not None:
            row["lpips"] = lp
        # supervision-channel metrics when gt exists (the reference's
        # depth/normal/feasim eval panel, gaussian_splatting.py:1032-1042)
        gt_depth = np.asarray(batch["depth"])
        if gt_depth.max() > 0:
            dm_mask = jnp.asarray(gt_depth > 0.05)
            row["depth_mae"] = float(
                losses.masked_l1(outs["depth"][..., 0],
                                 jnp.asarray(gt_depth), dm_mask)
            ) / scale
            row["normal_cos"] = 1.0 - float(
                losses.cosine_similarity_loss(
                    outs["normal"].reshape(-1, 3),
                    jnp.asarray(batch["normal"]).reshape(-1, 3),
                    weights=dm_mask.reshape(-1),
                )
            )
        results.append(row)
        print(f"view {i}: psnr={row['psnr']:.2f}")

    summary = {
        "experiment_name": config.experiment_name,
        "results": {
            "psnr": float(np.mean([r["psnr"] for r in results])),
            "ssim": float(np.mean([r["ssim"] for r in results])),
            **({"psnr_masked": float(np.mean(
                [r["psnr_masked"] for r in results]))}
               if all("psnr_masked" in r for r in results) else {}),
            **({"lpips": float(np.mean([r["lpips"] for r in results]))}
               if all("lpips" in r for r in results) else {}),
            "per_view": results,
        },
    }
    (out_dir / "metrics.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary["results"] | {"per_view": "..."}, indent=2))


if __name__ == "__main__":
    main()
