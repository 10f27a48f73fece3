"""Quality-at-scale probe: PSNR-over-steps at the bench operating point.

Trains a fresh field against GT renders of a synthetic 200k-Gaussian scene
at 800x800 (BASELINE config-2 scale) for a few hundred steps and prints
the PSNR curve — the guard the round-2 verdict asked for: a perf change
that silently broke quality at scale (e.g. an over-aggressive prune
margin or binning cap) shows up here even when every unit oracle passes.

Usage: timeout 1700 python scripts_dev/quality_probe.py [--steps 300]
Safe under GGT_PLATFORM=cpu with --n 5000 --wh 128 for a smoke run.
The small-scale regression version runs in tests/test_model_zoo.py::
TestQualityRegression (slow profile).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

if os.environ.get("GGT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GGT_PLATFORM"])

import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--wh", type=int, default=800)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--log-every", type=int, default=25)
    p.add_argument("--precision", default=None,
                   help="jax_default_matmul_precision override "
                        "(e.g. highest) — TPU default is bf16 MXU passes")
    p.add_argument("--backend", default=None,
                   help="rasterize backend override (pallas/xla)")
    args = p.parse_args()
    if args.precision:
        jax.config.update("jax_default_matmul_precision", args.precision)

    from gaussiangrasper_tpu.core.cameras import Camera
    from gaussiangrasper_tpu.engine.train_state import init_train_state, train_step
    from gaussiangrasper_tpu.models.efd import init_mlp
    from gaussiangrasper_tpu.models.gaussian_field import init_random
    from gaussiangrasper_tpu.models.model import GaussianSplatConfig, render

    wh = args.wh
    fdim = 32
    if args.backend:
        from gaussiangrasper_tpu.ops.rasterize import RasterizeConfig

        cfg = GaussianSplatConfig(
            feature_dim=fdim,
            raster=RasterizeConfig(backend=args.backend),
        )
    else:
        cfg = GaussianSplatConfig(feature_dim=fdim)
    key = jax.random.PRNGKey(0)

    # GT scene: the bench cloud with fixed colors; cameras orbit slightly.
    gt_field, gt_alive = init_random(key, args.n, extent=4.0,
                                     feature_dim=fdim, init_scale=0.02)
    gt_field = gt_field._replace(
        means=gt_field.means * jnp.array([0.5, 0.5, 0.25])
        + jnp.array([0.0, 0.0, -3.0])
    )
    f = 1000.0 * wh / 800.0  # keep the bench fov at any probe resolution
    cams = []
    for i in range(args.views):
        c2w = jnp.eye(4)[:3]
        c2w = c2w.at[0, 3].set(0.08 * (i - args.views / 2))
        cams.append(Camera.create(
            fx=f, fy=f, cx=wh / 2, cy=wh / 2,
            camera_to_world=c2w, width=wh, height=wh,
        ))

    def _gt(f, a, c):
        out = render(f, a, c, 0, cfg)
        return out["rgb"], out["depth"][..., 0], out["normal"]

    render_j = jax.jit(_gt)
    print("rendering GT views...", flush=True)
    gts = [jax.block_until_ready(render_j(gt_field, gt_alive, c)) for c in cams]

    # Student: a fresh random cloud in the same box (the from-scratch
    # regime — geometry, appearance and opacity all have to move).
    k1, _ = jax.random.split(jax.random.PRNGKey(1))
    student, alive = init_random(k1, args.n, extent=4.0, feature_dim=fdim,
                                 init_scale=0.02)
    student = student._replace(
        means=student.means * jnp.array([0.5, 0.5, 0.25])
        + jnp.array([0.0, 0.0, -3.0])
    )
    state = init_train_state(jax.random.PRNGKey(2), student, alive,
                             init_mlp(k1, fdim, 512, (128,)))

    def make_batch(rgb, depth, normal):
        g, pr, s = 4, 8, 16
        z = jnp.zeros
        return {
            "image": rgb,
            "depth": depth,
            "normal": normal,
            "valid_mask": jnp.ones((wh, wh), bool),
            "pair_a": z((g, pr, 2), jnp.int32),
            "pair_b": z((g, pr, 2), jnp.int32),
            "pair_valid": z((g, pr), bool),
            "group_valid": z((g,), bool),
            "points": z((s, 2), jnp.int32),
            "point_valid": z((s,), bool),
            "gt_clip": z((s, 512)),
        }

    batches = [make_batch(*g) for g in gts]
    step_j = jax.jit(lambda s, c, b: train_step(s, c, b, cfg),
                     donate_argnums=(0,))

    curve = []
    t0 = time.perf_counter()
    for step in range(args.steps):
        i = step % args.views
        state, metrics = step_j(state, cams[i], batches[i])
        if step % args.log_every == 0 or step == args.steps - 1:
            psnr = float(metrics["psnr"])
            curve.append((step, psnr))
            print(f"step {step:4d}  psnr {psnr:6.2f}  "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)

    first, last = curve[0][1], curve[-1][1]
    print(f"PSNR {first:.2f} -> {last:.2f} over {args.steps} steps "
          f"({(time.perf_counter()-t0)/args.steps*1e3:.0f} ms/step)")
    if first > 60.0:
        print("DEGENERATE: initial PSNR too high (empty renders?)")
        sys.exit(1)
    if not last > first + 3.0:
        print("QUALITY REGRESSION: curve did not climb", flush=True)
        sys.exit(1)
    print("QUALITY OK", flush=True)


if __name__ == "__main__":
    main()
