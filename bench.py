"""Headline benchmark: pixels/s/chip for the FULL train step at 800x800.

BASELINE.md config 2/3: ~200k Gaussians, fused RGB+feature+depth+normal
render, the complete reference loss set (L1+SSIM, depth, normal, SAM
contrastive, EFD up_loss, every-10-step regularizers) and the grouped Adam
update — i.e. the same work as the reference's `train_iteration`
(/root/reference/nerfstudio/engine/trainer.py:262-270 defines rays/s over
the full iteration with full_images_datamanager.py:357-359 hardcoding
800*800=640k px/step). The reference publishes no measured number
(BASELINE.json `published: {}`); vs_baseline is reported against an
estimated 13 Mpx/s for the reference CUDA trainer (~20 it/s at 800x800 on
its target GPU class).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
full train step, plus secondary fields: "latency_px_per_s" (per-iter-
synced median — the round-1..3 measurement), "render_fwd_bwd_px_per_s",
and the pair-throughput roofline. The headline is SUSTAINED throughput
(steps dispatched back-to-back, one sync per 10-step batch): a real
training loop never blocks per step, and per-iter sync exposes the
~25 ms/iter tunnel dispatch gap that pipelining overlaps (r4 xplane
profile, docs/ROUND_NOTES.md). A sanity band against the synced median
guards the known bogus-batch-timing flake.
"""

from __future__ import annotations

import json
import os
import time

import jax

if os.environ.get("GGT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GGT_PLATFORM"])

# Persistent compilation cache: the fused train step's first compile
# through the tunnel has measured up to ~20 min (round 3); a warm cache
# cuts a repeat bench to seconds. Harmless if the backend doesn't
# support executable serialization (the cache just stays cold).
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("GGT_COMPILE_CACHE", "/tmp/ggt_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

import jax.numpy as jnp

N_GAUSS = 200_000
WIDTH = HEIGHT = 800
FEATURE_DIM = 32
WARMUP = 3
ITERS = 10
REFERENCE_PX_PER_S = 13e6

# Roofline model for the compositing walk (the honest per-chip bound the
# round-3 verdict asked for, instead of only the estimated-GPU ratio):
# every binned pair evaluates its alpha against all tile_size^2 = 1024
# pixels in fwd and again in bwd, ~60 f32 VPU ops per pair-pixel
# (alpha/eexp/log1p/blend fwd + the gradient chain bwd). The v5e VPU
# sustains ~7 TFLOP/s f32, so the attainable pair-pixel rate is
# ~117 G pair-pixel/s. vs_pair_sol = achieved / attainable — the MFU
# analog for this workload; the gap is sort/gather/scatter overhead
# around arithmetic worth single-digit ms.
PAIR_PIXEL_FLOPS = 60.0
VPU_F32_FLOPS = 7.0e12
TILE_PIXELS = 1024.0

# Second bound (round-4 verdict): the VPU model above is the IDEAL-
# algorithm bound (a sequential per-pixel walk does ~60 f32 VPU ops per
# pair-pixel visit); the SHIPPED kernels instead ride the MXU with
# triangular prefix matmuls that do ~KC/2-times redundant FLOPs per
# pair-pixel. The formulation-attainable bound counts the matmul FLOPs
# the implemented algorithm must execute per pair-pixel visit:
#   fwd:  one (KC,KC)@(KC,P) prefix matmul per chunk  -> 2*KC flops/pp
#         one (P,KC)@(KC,C) accum matmul              -> 2*C
#   bwd:  two prefix matmuls (suffix lcomp + wgc)     -> 4*KC
#         col@g_out + w@g_out matmuls                 -> 4*C
# at the MEASURED in-kernel matmul rate (~33 TF/s f32 on this v5e, r4
# xplane; the MXU's f32 rate, not the bf16 peak). vs_mxu_formulation =
# (FLOPs the formulation needs / rate) / measured render time — i.e. the
# fraction of the formulation-bound floor actually achieved; unlike
# vs_pair_sol it excludes the 64x prefix amplification built into the
# algorithm, so round-over-round MFU progress is meaningful.
MXU_F32_FLOPS = 33.0e12
CHANNELS = 3 + FEATURE_DIM + 1 + 3  # fused rgb+feature+depth+normal pass


def build_scene():
    from gaussiangrasper_tpu.core.cameras import Camera
    from gaussiangrasper_tpu.models.gaussian_field import init_random

    key = jax.random.PRNGKey(0)
    field, alive = init_random(
        key, N_GAUSS, extent=4.0, feature_dim=FEATURE_DIM, init_scale=0.02
    )
    # Place the cloud in the camera frustum (OpenGL camera at origin, -z).
    field = field._replace(
        means=field.means * jnp.array([0.5, 0.5, 0.25]) + jnp.array([0.0, 0.0, -3.0])
    )
    cam = Camera.create(
        fx=1000.0, fy=1000.0, cx=WIDTH / 2, cy=HEIGHT / 2,
        camera_to_world=jnp.eye(4)[:3], width=WIDTH, height=HEIGHT,
    )
    return field, alive, cam


def make_batch(key):
    """Synthetic supervision batch with the real shapes the data layer
    emits (data/manager.py SamplerConfig: 32 groups x 800 pairs, 1000
    CLIP points — ref gaussian_splatting.py:911-912)."""
    ks = jax.random.split(key, 6)
    G, P, S = 32, 800, 1000
    return {
        "image": jax.random.uniform(ks[0], (HEIGHT, WIDTH, 3)),
        "depth": jnp.full((HEIGHT, WIDTH), 3.0),
        "normal": jnp.tile(jnp.array([0.0, 0.0, 1.0]), (HEIGHT, WIDTH, 1)),
        "valid_mask": jnp.ones((HEIGHT, WIDTH), bool),
        "pair_a": jax.random.randint(ks[1], (G, P, 2), 0, HEIGHT, jnp.int32),
        "pair_b": jax.random.randint(ks[2], (G, P, 2), 0, HEIGHT, jnp.int32),
        "pair_valid": jnp.ones((G, P), bool),
        "group_valid": jnp.ones((G,), bool),
        "points": jax.random.randint(ks[3], (S, 2), 0, HEIGHT, jnp.int32),
        "point_valid": jnp.ones((S,), bool),
        "gt_clip": jax.random.normal(ks[4], (S, 512)),
    }


def build_train_step():
    from gaussiangrasper_tpu.engine.train_state import init_train_state, train_step
    from gaussiangrasper_tpu.models.efd import init_mlp
    from gaussiangrasper_tpu.models.model import GaussianSplatConfig

    field, alive, cam = build_scene()
    key = jax.random.PRNGKey(1)
    fea_up = init_mlp(key, FEATURE_DIM, 512, (128,))
    state = init_train_state(key, field, alive, fea_up)
    batch = make_batch(key)
    cfg = GaussianSplatConfig(feature_dim=FEATURE_DIM)

    def step(s):
        return train_step(s, cam, batch, cfg)

    return step, state


def build_render_fwd_bwd():
    from gaussiangrasper_tpu.models.model import GaussianSplatConfig, render

    field, alive, cam = build_scene()
    cfg = GaussianSplatConfig(feature_dim=FEATURE_DIM)
    target = jnp.zeros((HEIGHT, WIDTH, 3))

    def fwd_bwd(field):
        def loss(f):
            out = render(f, alive, cam, 0, cfg)
            return (
                jnp.mean(jnp.abs(out["rgb"] - target))
                + jnp.mean(out["depth"]) * 0.0
                + jnp.mean(out["normal"]) * 0.0
                + jnp.mean(out["feature"]) * 0.0
            )

        return jax.value_and_grad(loss)(field)

    return jax.jit(fwd_bwd), field


def _median_time(fn, arg, *, donated=False):
    """Median of per-iteration wall times, each individually synced: the
    tunneled device has produced sporadic bogus (near-zero) batch timings;
    per-iteration medians are robust to those flakes."""
    out = arg
    for _ in range(WARMUP):
        out = fn(out if donated else arg)
        if donated:
            out = out[0] if isinstance(out, tuple) else out
    jax.block_until_ready(out)
    times = []
    cur = out if donated else arg
    for _ in range(ITERS):
        t0 = time.perf_counter()
        res = fn(cur)
        if donated:
            cur = res[0] if isinstance(res, tuple) else res
            jax.block_until_ready(cur)
        else:
            jax.block_until_ready(res)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def _count_pairs():
    """Binned pairs at the bench point (for the pair-throughput roofline)."""
    from gaussiangrasper_tpu.core.cameras import view_matrix
    from gaussiangrasper_tpu.models.model import GaussianSplatConfig
    from gaussiangrasper_tpu.ops.projection import project_gaussians
    from gaussiangrasper_tpu.ops.rasterize import bin_gaussians

    field, alive, cam = build_scene()
    cfg = GaussianSplatConfig(feature_dim=FEATURE_DIM)
    vm = view_matrix(cam.camera_to_world)

    @jax.jit
    def pairs(means, scales, quats, opac):
        proj = project_gaussians(means, scales, quats, vm, cam.fx, cam.fy,
                                 cam.cx, cam.cy, WIDTH, HEIGHT, mask=alive)
        bins = bin_gaussians(proj, WIDTH, HEIGHT, cfg.raster, opacities=opac,
                             build_table=False, keep_pairs=True)
        k = cfg.raster.max_gaussians_per_tile
        return jnp.sum(jnp.minimum(bins.tile_count, k))

    return int(pairs(field.means, jnp.exp(field.log_scales), field.quats,
                     jax.nn.sigmoid(field.opacity_logits)))


def _pipelined_time(step, state, batch=10, nbatches=3):
    """Sustained throughput: dispatch `batch` donated steps back-to-back
    and sync ONCE per batch — how a real training loop runs (the host
    loop never blocks per step), so dispatch latency (~25 ms/iter through
    this tunnel, r4 xplane profile) overlaps device compute. Median over
    `nbatches` batches guards against the tunnel's sporadic bogus batch
    timings (CLAUDE.md); the caller cross-checks against the per-iter-
    synced median before trusting it."""
    state, _ = step(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    times = []
    for _ in range(nbatches):
        t0 = time.perf_counter()
        for _ in range(batch):
            state, _ = step(state)
        jax.block_until_ready(jax.tree.leaves(state)[0])
        times.append((time.perf_counter() - t0) / batch)
    times.sort()
    return times[nbatches // 2], state


MIN_PLAUSIBLE_S = 5e-3
"""Flake floor: the tunneled device sporadically enters a mode where
block_until_ready returns before execution finishes and EVERY timing
reads ~0.1 ms (verified 2026-08-21: an 8192^2 matmul "measured" 0.1 ms).
The bench's train step moves >1 GB of HBM traffic — anything under 5 ms
is physically impossible (~8 ms at pure speed-of-light), so timings
below this are the flake, not speed."""


def _measure():
    for attempt in range(3):
        step, state = build_train_step()
        dt_sync = _median_time(step, state, donated=True)
        if dt_sync > MIN_PLAUSIBLE_S:
            break
        # bogus-timing mode: give the device a quiet period and retry
        time.sleep(60)
    else:
        raise RuntimeError(
            f"device returned impossible step times ({dt_sync*1e3:.2f} ms) "
            "on 3 attempts — the tunnel's async-completion flake"
        )
    # rebuild (the synced loop consumed the donated state)
    step, state = build_train_step()
    dt_pipe, _ = _pipelined_time(step, state)
    # Sanity: pipelined must sit between ~the device time and the synced
    # latency; a bogus (near-zero) batch timing falls back to the synced
    # number so the headline is never inflated by a flake.
    dt_full = dt_pipe if 0.3 * dt_sync < dt_pipe <= dt_sync * 1.2 else dt_sync

    fwd_bwd, field = build_render_fwd_bwd()
    dt_render = _median_time(fwd_bwd, field)
    render_flake = dt_render < MIN_PLAUSIBLE_S
    if render_flake:
        dt_render = dt_sync  # substituted; flagged in the JSON
    return dt_full, dt_sync, dt_render, render_flake


def main():
    # Watchdog: the tunneled TPU in this image can wedge indefinitely (see
    # CLAUDE.md); if the measurement doesn't finish in time, emit a JSON
    # line flagging the condition instead of hanging the driver.
    import os
    import threading

    backend = jax.default_backend()
    budget_s = float(os.environ.get("GGT_BENCH_TIMEOUT", "1500"))
    result = {}

    def run():
        try:
            (result["dt"], result["dt_sync"], result["dt_render"],
             result["render_flake"]) = _measure()
        except Exception as e:  # surface compile/runtime errors as a line
            result["error"] = f"{type(e).__name__}: {e}"
            return
        try:
            result["pairs"] = _count_pairs()
        except Exception as e:  # roofline is optional — flag, don't hide
            result["pairs_error"] = f"{type(e).__name__}: {e}"

    worker = threading.Thread(target=run, daemon=True)
    worker.start()
    worker.join(timeout=budget_s)

    if "dt" in result:
        px = WIDTH * HEIGHT
        px_per_s = px / result["dt"]
        extras = {}
        if result.get("render_flake"):
            # dt_render was substituted by dt_sync (bogus-timing mode hit
            # only the render measurement) — mark the derived fields
            extras["render_timing_flake"] = True
        if "pairs" in result and not result.get("render_flake"):
            # pair-throughput roofline (see PAIR_PIXEL_FLOPS comment):
            # fwd+bwd composites every pair twice against 1024 pixels
            pp_per_s = 2.0 * result["pairs"] * TILE_PIXELS / result["dt_render"]
            sol = VPU_F32_FLOPS / PAIR_PIXEL_FLOPS
            # formulation-attainable floor (see MXU_F32_FLOPS comment)
            from gaussiangrasper_tpu.ops.rasterize_pallas import KC

            mxu_flops = (result["pairs"] * TILE_PIXELS
                         * (6.0 * KC + 6.0 * CHANNELS))
            dt_floor = mxu_flops / MXU_F32_FLOPS
            extras.update({
                "pairs_composited": result["pairs"],
                "pair_pixel_per_s": round(pp_per_s, 1),
                "vs_pair_sol": round(pp_per_s / sol, 4),
                "vs_mxu_formulation": round(
                    dt_floor / result["dt_render"], 4),
            })
        if "pairs_error" in result:
            extras["pairs_error"] = result["pairs_error"]
        print(
            json.dumps(
                {
                    "metric": f"pixels_per_s_per_chip_train_step_800x800_200k_{backend}",
                    "value": round(px_per_s, 1),
                    "unit": "pixels/s",
                    "vs_baseline": round(px_per_s / REFERENCE_PX_PER_S, 4),
                    # sustained (pipelined) vs per-iter-synced: the value
                    # above is sustained throughput (how training actually
                    # runs); this is the per-step latency for comparison
                    "latency_px_per_s": round(px / result["dt_sync"], 1),
                    "render_fwd_bwd_px_per_s": round(px / result["dt_render"], 1),
                    **extras,
                }
            )
        )
        # Exit NORMALLY on success so the JAX client tears the tunnel
        # session down cleanly — an os._exit here has been followed by the
        # next client wedging the remote chip. The hard exit is reserved
        # for the watchdog path below, where the device is already stuck.
        return
    reason = result.get("error", f"device did not respond within {budget_s:.0f}s")
    print(
        json.dumps(
            {
                "metric": f"pixels_per_s_per_chip_train_step_800x800_200k_{backend}_UNAVAILABLE",
                "value": 0.0,
                "unit": "pixels/s",
                "vs_baseline": 0.0,
                "note": reason,
            }
        )
    )
    os._exit(1)


if __name__ == "__main__":
    main()
