"""Standing quality-at-scale gate: reduced PSNR curve + precision A/B.

Round protocol (run each round on TPU, background, under timeout; append
the output to docs/ROUND_NOTES.md):

    timeout 1700 python scripts_dev/quality_gate.py

Three checks; 2 and 3 are automated versions of what caught the round-3
bf16 SSIM cancellation bug (docs/ROUND_NOTES.md):

1. TABLETOP CURVE (round-5, VERDICT r4 #4): from-scratch PRODUCTION
   training (trainer + datamanager + refinement) on the ray-traced
   tabletop fixture (data/synthetic.py) — image-like data the model
   cannot trivially represent — must climb by >= 3 dB masked PSNR.
   Catches densify/loss-pipeline regressions that the self-representable
   Gaussian-field GT of check 3 cannot (its GT is fit by construction).
   Skippable with --no-tabletop for a kernels-only gate.
2. CURVE: from-scratch raw-step training at a reduced bench operating
   point must CLIMB by >= 3 dB (same contract as scripts_dev/
   quality_probe.py, fewer steps so the gate fits a round budget).
3. PRECISION A/B: the same training trajectory is run at the platform's
   default matmul precision and again with everything pinned to HIGHEST
   (same seed, same data — the Gaussian-field GT is the right arm here:
   both runs chase the SAME target, isolating precision). If any stage
   suffers a bf16 cancellation the default-precision curve falls behind;
   the gate fails when the final PSNRs diverge by more than PSNR_BAND
   dB. On CPU both runs are f32 and identical — the A/B is a TPU gate
   (the in-suite reduced version lives in
   tests/test_model_zoo.py::TestPrecisionAB, slow profile).

PSNR_BAND = 1.0 dB: the round-3 bug produced a 14 dB gap at step 300;
healthy runs measured < 0.3 dB apart (precision only reorders rounding),
so 1.0 leaves slack for seed-free nondeterminism while catching any real
cancellation an order of magnitude before it reaches bug scale.

Safe under GGT_PLATFORM=cpu with --n 5000 --wh 128 for a smoke run.
"""

from __future__ import annotations

import argparse
import contextlib
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

if os.environ.get("GGT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GGT_PLATFORM"])

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("GGT_COMPILE_CACHE", "/tmp/ggt_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

import jax.numpy as jnp

PSNR_BAND = 1.0  # dB, see module docstring


def build(n, wh, views, fdim=32):
    from gaussiangrasper_tpu.core.cameras import Camera
    from gaussiangrasper_tpu.models.gaussian_field import init_random
    from gaussiangrasper_tpu.models.model import GaussianSplatConfig, render

    cfg = GaussianSplatConfig(feature_dim=fdim)
    key = jax.random.PRNGKey(0)
    gt_field, gt_alive = init_random(key, n, extent=4.0, feature_dim=fdim,
                                     init_scale=0.02)
    gt_field = gt_field._replace(
        means=gt_field.means * jnp.array([0.5, 0.5, 0.25])
        + jnp.array([0.0, 0.0, -3.0])
    )
    f = 1000.0 * wh / 800.0
    cams = []
    for i in range(views):
        c2w = jnp.eye(4)[:3]
        c2w = c2w.at[0, 3].set(0.08 * (i - views / 2))
        cams.append(Camera.create(fx=f, fy=f, cx=wh / 2, cy=wh / 2,
                                  camera_to_world=c2w, width=wh, height=wh))

    render_j = jax.jit(lambda f_, a, c: render(f_, a, c, 0, cfg))
    gts = []
    for c in cams:
        out = jax.block_until_ready(render_j(gt_field, gt_alive, c))
        gts.append((out["rgb"], out["depth"][..., 0], out["normal"]))
    return cfg, cams, gts


def make_batch(rgb, depth, normal, wh):
    g, pr, s = 4, 8, 16
    z = jnp.zeros
    return {
        "image": rgb, "depth": depth, "normal": normal,
        "valid_mask": jnp.ones((wh, wh), bool),
        "pair_a": z((g, pr, 2), jnp.int32), "pair_b": z((g, pr, 2), jnp.int32),
        "pair_valid": z((g, pr), bool), "group_valid": z((g,), bool),
        "points": z((s, 2), jnp.int32), "point_valid": z((s,), bool),
        "gt_clip": z((s, 512)),
    }


def run_curve(cfg, cams, gts, n, wh, steps, log_every, precision=None,
              fdim=32):
    """Train a fresh student for `steps`; returns [(step, psnr)].
    precision: None = platform default, or 'highest' (traced under
    jax.default_matmul_precision, pinning every dot/conv, AND with the
    Pallas kernel_compute pinned to f32 — the kernel's explicit bf16
    matmul-input casts are NOT covered by the matmul-precision flag, so
    the A/B must pin both for the gap to catch kernel quantization)."""
    import dataclasses

    if precision == "highest":
        cfg = dataclasses.replace(
            cfg, raster=dataclasses.replace(cfg.raster, kernel_compute="f32")
        )
    from gaussiangrasper_tpu.engine.train_state import init_train_state, train_step
    from gaussiangrasper_tpu.models.efd import init_mlp
    from gaussiangrasper_tpu.models.gaussian_field import init_random

    k1, _ = jax.random.split(jax.random.PRNGKey(1))
    student, alive = init_random(k1, n, extent=4.0, feature_dim=fdim,
                                 init_scale=0.02)
    student = student._replace(
        means=student.means * jnp.array([0.5, 0.5, 0.25])
        + jnp.array([0.0, 0.0, -3.0])
    )
    state = init_train_state(jax.random.PRNGKey(2), student, alive,
                             init_mlp(k1, fdim, 512, (128,)))
    batches = [make_batch(*g, wh) for g in gts]

    ctx = (jax.default_matmul_precision(precision) if precision
           else contextlib.nullcontext())
    with ctx:
        step_j = jax.jit(lambda s, c, b: train_step(s, c, b, cfg),
                         donate_argnums=(0,))
        curve = []
        for step in range(steps):
            i = step % len(cams)
            state, metrics = step_j(state, cams[i], batches[i])
            if step % log_every == 0 or step == steps - 1:
                curve.append((step, float(metrics["psnr"])))
    return curve


def run_tabletop_curve(wh, steps, capacity, workdir=None):
    """Check 1: production-path training on the ray-traced tabletop.
    Returns (masked_psnr_before, masked_psnr_after) on train view 0."""
    import tempfile

    import numpy as np

    from gaussiangrasper_tpu.data.synthetic import generate_tabletop
    from gaussiangrasper_tpu.engine.trainer import TrainerConfig, make_trainer
    from gaussiangrasper_tpu.models.model import GaussianSplatConfig, render

    workdir = Path(workdir or tempfile.mkdtemp(prefix="ggt_gate_"))
    scene = generate_tabletop(workdir / "scene", width=wh, height=wh,
                              n_views=6, feature_downscale=4)
    cfg = TrainerConfig(
        data=scene, output_dir=workdir / "runs", experiment_name="gate",
        max_iterations=steps, steps_per_save=steps, capacity=capacity,
        model=GaussianSplatConfig(
            num_downscales=0, warmup_length=min(100, steps // 3),
            refine_every=100, stop_split_at=steps,
        ),
    )
    trainer = make_trainer(cfg)
    state0 = trainer.setup()
    cam0, batch0 = trainer.dm.get_batch(0)
    mask = np.asarray(batch0["valid_mask"])

    def masked_psnr(state, step):
        out = render(state.field, state.alive, cam0, step, cfg.model)
        err = (np.asarray(out["rgb"]) - np.asarray(batch0["image"])) ** 2
        mse = float(err[mask].mean())
        return -10.0 * float(jnp.log10(mse + 1e-12))

    before = masked_psnr(state0, 0)
    state = trainer.train()
    after = masked_psnr(state, steps)
    return before, after


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--wh", type=int, default=800)
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--views", type=int, default=2)
    p.add_argument("--log-every", type=int, default=25)
    p.add_argument("--no-tabletop", action="store_true",
                   help="skip the production tabletop curve (check 1)")
    p.add_argument("--tt-wh", type=int, default=256)
    p.add_argument("--tt-steps", type=int, default=400)
    p.add_argument("--tt-capacity", type=int, default=32768)
    args = p.parse_args()

    t0 = time.perf_counter()
    tt_ok = True
    if not args.no_tabletop:
        tb, ta = run_tabletop_curve(args.tt_wh, args.tt_steps,
                                    args.tt_capacity)
        print(f"[tabletop] masked PSNR {tb:.2f} -> {ta:.2f} "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
        # calibration (256^2/cap 32768, CPU smoke + TPU r5): seeded init
        # ~12.6 dB, climbs past 16 within 400 steps; a broken densify/
        # loss path shows as NO climb
        if not ta > tb + 3.0:
            print(f"[tabletop] QUALITY REGRESSION: {tb:.2f} -> {ta:.2f}")
            tt_ok = False
    cfg, cams, gts = build(args.n, args.wh, args.views)
    print(f"GT ready ({time.perf_counter()-t0:.0f}s)", flush=True)

    results = {}
    for name, prec in (("default", None), ("highest", "highest")):
        curve = run_curve(cfg, cams, gts, args.n, args.wh, args.steps,
                          args.log_every, precision=prec)
        results[name] = curve
        pts = "  ".join(f"{s}:{p:.2f}" for s, p in curve)
        print(f"[{name}] {pts}  ({time.perf_counter()-t0:.0f}s)", flush=True)

    ok = tt_ok
    for name, curve in results.items():
        first, last = curve[0][1], curve[-1][1]
        if first > 60.0:
            print(f"[{name}] DEGENERATE: initial PSNR {first:.1f}")
            ok = False
        elif not last > first + 3.0:
            print(f"[{name}] QUALITY REGRESSION: {first:.2f} -> {last:.2f}")
            ok = False
    gap = abs(results["default"][-1][1] - results["highest"][-1][1])
    print(f"precision A/B final gap: {gap:.2f} dB (band {PSNR_BAND})")
    if gap > PSNR_BAND:
        print("PRECISION REGRESSION: default-precision curve diverged — "
              "a stage is losing a cancellation to bf16 (round-3 SSIM "
              "class); sweep stages with jax.default_matmul_precision")
        ok = False
    print("QUALITY GATE " + ("OK" if ok else "FAILED"), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
