"""Round-5 perf probe: bf16 kernel-compute A/B + full-step glue hunt.

Usage: timeout 1700 python scripts_dev/r5_probe.py [--stages ab16,kern16,prof,pipe16]
TPU protocol (CLAUDE.md): background, strict timeout, per-iteration sync
medians, trivial dispatch first, exit normally. Safe under
GGT_PLATFORM=cpu with GGT_PROBE_N/WH/ITERS for a smoke run.

Stages:
  ab16   - render fwd+bwd, kernel_compute f32 vs bf16 (same process)
  kern16 - fwd / bwd pair kernels alone, f32 vs bf16
  pipe16 - full train step pipelined, f32 vs bf16 (GGT_KERNEL_COMPUTE
           env steers the model path, so this stage reads the env; run
           the two arms as two invocations)
  prof   - xplane trace of the FULL train step; prints the top ops by
           device self-time via xprof hlo_stats (the r4 glue budget flow)
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

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("GGT_COMPILE_CACHE", "/tmp/ggt_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

import jax.numpy as jnp

N_GAUSS = int(os.environ.get("GGT_PROBE_N", "200000"))
W = H = int(os.environ.get("GGT_PROBE_WH", "800"))
F = 32
ITERS = int(os.environ.get("GGT_PROBE_ITERS", "5"))


def timeit(fn, *args, iters=ITERS, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    if jax.default_backend() == "tpu" and med < 1e-3:
        print(f"  !! implausible {med*1e3:.2f} ms — bogus-timing flake, "
              "numbers below are invalid", flush=True)
    return med


def build_scene():
    from gaussiangrasper_tpu.core.cameras import Camera
    from gaussiangrasper_tpu.models.gaussian_field import init_random

    key = jax.random.PRNGKey(0)
    field, alive = init_random(key, N_GAUSS, extent=4.0, feature_dim=F,
                               init_scale=0.02)
    field = field._replace(
        means=field.means * jnp.array([0.5, 0.5, 0.25]) + jnp.array([0.0, 0.0, -3.0])
    )
    cam = Camera.create(fx=1000.0, fy=1000.0, cx=W / 2, cy=H / 2,
                        camera_to_world=jnp.eye(4)[:3], width=W, height=H)
    return field, alive, cam


def xplane_hlo_table(trace_dir, top=40):
    """Parse the newest xplane capture into (op name, self ms) rows."""
    import glob
    import json

    files = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True),
                   key=os.path.getmtime)
    if not files:
        print("no xplane files", flush=True)
        return []
    sess = str(Path(files[-1]).parent)
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([sess], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    payload = json.loads(data)
    rows = payload[0]["rows"] if isinstance(payload, list) else payload["rows"]
    # columns: program_id, hlo_name, .., category, .., self time us ...
    # find numeric "self time" column from the header if present
    out = []
    for r in rows:
        c = r["c"] if isinstance(r, dict) else r
        vals = [x.get("v") if isinstance(x, dict) else x for x in c]
        out.append(vals)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stages", default="ab16")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()
    stages = set(args.stages.split(","))

    tiny = jnp.zeros((8,))
    f = jax.jit(lambda x: x + 1.0)
    dt = timeit(f, tiny)
    print(f"dispatch RTT: {dt*1e3:.2f} ms", flush=True)

    from gaussiangrasper_tpu.core.cameras import view_matrix
    from gaussiangrasper_tpu.ops import rasterize_pallas
    from gaussiangrasper_tpu.ops.projection import project_gaussians
    from gaussiangrasper_tpu.ops.rasterize import (
        RasterizeConfig, bin_gaussians, rasterize_projected,
    )

    field, alive, cam = build_scene()
    vm = view_matrix(cam.camera_to_world)

    def project(means, scales, quats):
        return project_gaussians(means, scales, quats, vm, cam.fx, cam.fy,
                                 cam.cx, cam.cy, W, H, mask=alive)

    proj = jax.jit(project)(field.means, jnp.exp(field.log_scales), field.quats)
    jax.block_until_ready(proj)
    opac = jax.nn.sigmoid(field.opacity_logits)
    colors = jnp.concatenate(
        [jax.nn.sigmoid(field.sh_coeffs[:, 0]), field.features,
         proj.depths[:, None], jnp.zeros((N_GAUSS, 3))], axis=-1)
    bg = jnp.zeros((colors.shape[-1],))

    def render_loss(pr, col, op, cfg):
        out = rasterize_projected(pr, col, op, bg, W, H, cfg)
        return jnp.mean(jnp.abs(out["image"])) + 0.0 * jnp.mean(out["alpha"])

    if "ab16" in stages:
        for compute in ("f32", "bf16"):
            cfg = RasterizeConfig(backend="pallas", kernel_compute=compute)
            fn = jax.jit(jax.grad(render_loss, argnums=(0, 1, 2)),
                         static_argnums=(3,))
            dt = timeit(fn, proj, colors, opac, cfg)
            print(f"render fwd+bwd pallas [{compute}]: {dt*1e3:.1f} ms",
                  flush=True)

    if "kern16" in stages:
        cfg = RasterizeConfig(backend="pallas")
        bins = jax.jit(lambda pr: bin_gaussians(
            pr, W, H, cfg, opacities=opac, build_table=False,
            keep_pairs=True))(proj)
        tw_ = (W + 31) // 32
        k_cap = 2048
        kr = -(-k_cap // 128) * 128
        pair_attrs = jax.jit(lambda gi: rasterize_pallas._gather_pairs(
            gi, proj.xys, proj.conics, opac, colors, kr))(bins.pair_gidx)
        b = bins.pair_gidx.shape[0]
        starts = jnp.minimum(bins.pair_starts, b)
        counts = jnp.minimum(jnp.minimum(bins.tile_count, k_cap),
                             jnp.maximum(b - starts, 0))
        t_ = starts.shape[0]
        interp = not rasterize_pallas._on_tpu()
        for compute in ("f32", "bf16"):
            mm = jnp.bfloat16 if compute == "bf16" else jnp.float32
            fwd = jax.jit(lambda s, c, pa: rasterize_pallas._call_fwd_pairs(
                s, c, pa, bg[None, :], tw_, 32, t_, colors.shape[-1], kr,
                interpret=interp, mm=mm))
            dt = timeit(fwd, starts, counts, pair_attrs)
            print(f"v3 fwd kernel [{compute}]: {dt*1e3:.1f} ms", flush=True)
            out, alpha, logt, ncomp = fwd(starts, counts, pair_attrs)
            g_out = jnp.ones_like(out)
            g_alpha = jnp.zeros_like(alpha)
            bwd = jax.jit(lambda s, c, pa, go, ga, lt, nc:
                          rasterize_pallas._call_bwd_pairs(
                              s, c, pa, bg, go, ga, lt, nc, tw_, 32, kr,
                              interpret=interp, mm=mm))
            dt = timeit(bwd, starts, counts, pair_attrs, g_out, g_alpha,
                        logt, ncomp)
            print(f"v3 bwd kernel [{compute}]: {dt*1e3:.1f} ms", flush=True)

    if "pipe16" in stages:
        import bench as benchmod

        step, state = benchmod.build_train_step()
        state, _ = step(state)
        jax.block_until_ready(state)
        NB, BATCH = 3, 10
        times = []
        for _ in range(NB):
            t0 = time.perf_counter()
            for _ in range(BATCH):
                state, metrics = step(state)
            jax.block_until_ready(state)
            times.append((time.perf_counter() - t0) / BATCH)
        times.sort()
        dt = times[NB // 2]
        kc = os.environ.get("GGT_KERNEL_COMPUTE", "auto")
        print(f"full train step PIPELINED [{kc}]: {dt*1e3:.1f} ms/step "
              f"({W*H/dt/1e6:.2f} Mpx/s) batches={[f'{t*1e3:.1f}' for t in times]}",
              flush=True)

    if "prof" in stages:
        # xplane capture of the FULL train step (the r4 flow traced only
        # the render) -> exact per-op device budget for the glue hunt.
        import shutil

        import bench as benchmod

        step, state = benchmod.build_train_step()
        state, _ = step(state)
        jax.block_until_ready(state)
        shutil.rmtree("/tmp/ggt_trace_r5", ignore_errors=True)
        with jax.profiler.trace("/tmp/ggt_trace_r5"):
            for _ in range(3):
                state, metrics = step(state)
            jax.block_until_ready(state)
        rows = xplane_hlo_table("/tmp/ggt_trace_r5")
        print(f"hlo_stats rows: {len(rows)}", flush=True)
        # dump raw rows to a file for offline analysis; print a summary
        import json

        with open("/tmp/ggt_hlo_stats_r5.json", "w") as fh:
            json.dump(rows, fh)
        print("rows written to /tmp/ggt_hlo_stats_r5.json", flush=True)


if __name__ == "__main__":
    main()
