"""Round-4 perf probe: reverse-walk backward + prefix-impl A/B + full-step
stage decomposition.

Usage: timeout 1500 python scripts_dev/r4_probe.py [--stages ab,kern,full,scatter]
Per the TPU protocol (CLAUDE.md): run in the background under timeout,
per-iteration sync medians, trivial dispatch first. GGT_PREFIX=shift|matmul
selects the in-kernel prefix implementation (module-level, so A/B needs two
processes). Safe under GGT_PLATFORM=cpu for a smoke run (GGT_PROBE_ITERS=1).
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
    # the tunnel's bogus-timing mode makes every timing read ~0.1 ms
    # (bench.MIN_PLAUSIBLE_S rationale) — flag rather than report speed
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stages", default="ab")
    args = p.parse_args()
    stages = set(args.stages.split(","))

    tiny = jnp.zeros((8,))
    f = jax.jit(lambda x: x + 1.0)
    dt = timeit(f, tiny)
    from gaussiangrasper_tpu.ops import rasterize_pallas
    print(f"dispatch RTT: {dt*1e3:.2f} ms "
          f"(prefix={rasterize_pallas.PREFIX_IMPL})", flush=True)

    from gaussiangrasper_tpu.core.cameras import view_matrix
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

    if "ab" in stages:
        # End-to-end render fwd+bwd with the new reverse-walk backward.
        cfg = RasterizeConfig(backend="pallas")
        fn = jax.jit(jax.grad(render_loss, argnums=(0, 1, 2)),
                     static_argnums=(3,))
        dt = timeit(fn, proj, colors, opac, cfg)
        print(f"render fwd+bwd pallas (rev-walk bwd): {dt*1e3:.1f} ms",
              flush=True)

    if "kern" in stages:
        # fwd kernel alone (gather+kernel) and fwd-only value pass.
        cfg = RasterizeConfig(backend="pallas")
        bins = jax.jit(lambda pr: bin_gaussians(
            pr, W, H, cfg, opacities=opac, build_table=False,
            keep_pairs=True))(proj)
        tw_ = (W + 31) // 32
        fwd_fn = jax.jit(lambda gi, st, tc: rasterize_pallas.composite_pair_stream(
            gi, st, tc, proj.xys, proj.conics, opac, colors, bg,
            tw_, 32, k_cap=2048)[0])
        dt = timeit(fwd_fn, bins.pair_gidx, bins.pair_starts, bins.tile_count)
        print(f"v3 fwd (gather+kernel): {dt*1e3:.1f} ms", flush=True)

    if "bwdk" in stages:
        # bwd kernel ALONE (reverse walk + grad flush; no scatter, no VJP
        # glue) and the backward scatter-add alone, so fwd/bwd/scatter
        # split cleanly (each stage pays the dispatch floor once).
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
        out, alpha, logt, cumall = jax.jit(
            lambda s, c, pa: rasterize_pallas._call_fwd_pairs(
                s, c, pa, bg[None, :], tw_, 32, t_, colors.shape[-1], kr,
                interpret=interp))(starts, counts, pair_attrs)
        g_out = jnp.ones_like(out)
        g_alpha = jnp.zeros_like(alpha)
        bwd_fn = jax.jit(lambda s, c, pa, go, ga, lt, ca:
                         rasterize_pallas._call_bwd_pairs(
                             s, c, pa, bg, go, ga, lt, ca, tw_, 32, kr,
                             interpret=interp))
        dt = timeit(bwd_fn, starts, counts, pair_attrs, g_out, g_alpha,
                    logt, cumall)
        print(f"v3 bwd kernel alone: {dt*1e3:.1f} ms", flush=True)

        gpairs = bwd_fn(starts, counts, pair_attrs, g_out, g_alpha, logt,
                        cumall)
        a = 6 + colors.shape[-1]
        sc_fn = jax.jit(lambda gi, gp: jnp.zeros(
            (N_GAUSS, a), gp.dtype).at[gi].add(gp[:b, :a]))
        dt = timeit(sc_fn, bins.pair_gidx, gpairs)
        print(f"v3 bwd scatter-add ({b/1e6:.2f}M x {a}): {dt*1e3:.1f} ms",
              flush=True)

        srt_fn = jax.jit(lambda pr: bin_gaussians(
            pr, W, H, cfg, opacities=opac, build_table=False,
            keep_pairs=True).pair_gidx)
        dt = timeit(srt_fn, proj)
        print(f"v3 binning alone: {dt*1e3:.1f} ms", flush=True)

    if "prof" in stages:
        # jax.profiler trace through the tunnel (unknown support): trace
        # 3 iterations of the fused render fwd+bwd; if xplane files land,
        # scripts_dev can pull exact per-op times.
        cfg = RasterizeConfig(backend="pallas")
        fn = jax.jit(jax.grad(render_loss, argnums=(0, 1, 2)),
                     static_argnums=(3,))
        out = fn(proj, colors, opac, cfg)
        jax.block_until_ready(out)
        try:
            with jax.profiler.trace("/tmp/ggt_trace"):
                for _ in range(3):
                    out = fn(proj, colors, opac, cfg)
                jax.block_until_ready(out)
            import glob
            files = glob.glob("/tmp/ggt_trace/**/*.xplane.pb", recursive=True)
            print(f"profiler trace: {len(files)} xplane files", flush=True)
        except Exception as e:
            print(f"profiler trace FAILED: {type(e).__name__}: {e}",
                  flush=True)

    if "sort" in stages:
        key = jax.random.PRNGKey(2)
        for n_pairs in (3_200_000,):
            kt = jax.random.randint(key, (n_pairs,), 0, 625, jnp.int32)
            kd = jax.random.uniform(key, (n_pairs,))
            payload = jax.random.randint(key, (n_pairs,), 0, N_GAUSS, jnp.int32)
            fn2 = jax.jit(lambda a, b, c: jax.lax.sort(
                (a, b, c), num_keys=2, is_stable=True))
            dt = timeit(fn2, kt, kd, payload)
            print(f"two-key sort {n_pairs/1e6:.1f}M: {dt*1e3:.2f} ms",
                  flush=True)

    if "full" in stages:
        import bench as benchmod

        step, state = benchmod.build_train_step()
        dt = benchmod._median_time(step, state, donated=True)
        print(f"full train step: {dt*1e3:.1f} ms "
              f"({W*H/dt/1e6:.2f} Mpx/s)", flush=True)

        from gaussiangrasper_tpu.models import losses as L

        k0 = jax.random.PRNGKey(7)
        im0 = jax.random.uniform(k0, (H, W, 3))
        im1 = jax.random.uniform(jax.random.PRNGKey(8), (H, W, 3))
        f_ssim = jax.jit(jax.grad(lambda a: 1.0 - L.ssim(a, im1)))
        dt = timeit(f_ssim, im0)
        print(f"ssim fwd+bwd 800x800 (HIGHEST convs): {dt*1e3:.1f} ms",
              flush=True)

        def proj_loss(m, s, q):
            pr = project_gaussians(m, s, q, vm, cam.fx, cam.fy, cam.cx,
                                   cam.cy, W, H, mask=alive)
            return (jnp.sum(pr.xys) + jnp.sum(pr.conics) + jnp.sum(pr.depths)
                    + jnp.sum(pr.cov2d))

        f_proj = jax.jit(jax.grad(proj_loss, argnums=(0, 1, 2)))
        dt = timeit(f_proj, field.means, jnp.exp(field.log_scales), field.quats)
        print(f"projection fwd+bwd: {dt*1e3:.1f} ms", flush=True)

        # loss tail without the render: grouped adam alone (fresh state —
        # the earlier donated `state` buffers are consumed by the full-
        # step runs above).
        from gaussiangrasper_tpu.engine import optimizers as optim

        _, state2 = benchmod.build_train_step()
        ms = {"field": state2.field, "fea_up": state2.fea_up, "pose": None}
        grads = jax.tree.map(jnp.zeros_like, ms)
        f_opt = jax.jit(lambda g, o: optim.apply_updates_grouped(
            ms, g, o, jnp.asarray(100, jnp.int32)))
        dt = timeit(f_opt, grads, state2.opt)
        print(f"grouped adam update alone: {dt*1e3:.1f} ms", flush=True)

    if "pipe" in stages:
        # Pipelined throughput: dispatch a whole batch of steps and sync
        # ONCE — the host dispatch gap (~25 ms/iter through this tunnel,
        # r4 xplane profile) overlaps device compute, which is what a
        # real training loop does. Guard against the known bogus-batch-
        # timing flake with a median over batches and a device-time sanity
        # floor.
        import bench as benchmod

        step, state = benchmod.build_train_step()
        state, _ = step(state)  # compile + warm
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
        print(f"full train step PIPELINED: {dt*1e3:.1f} ms/step "
              f"({W*H/dt/1e6:.2f} Mpx/s) batches={[f'{t*1e3:.1f}' for t in times]}",
              flush=True)

    if "scatter" in stages:
        key = jax.random.PRNGKey(1)
        for rows in (960_000, 2_560_000):
            idx = jax.random.randint(key, (rows,), 0, N_GAUSS, jnp.int32)
            s_fn = jax.jit(lambda t, i, v: t.at[i].add(v))
            vals = jax.random.normal(key, (rows, 45))
            zero = jnp.zeros((N_GAUSS, 45))
            dt = timeit(s_fn, zero, idx, vals)
            print(f"scatter-add {rows/1e6:.2f}M rows x 45 f32: {dt*1e3:.2f} ms",
                  flush=True)
            # bf16 values, f32 accumulator
            vals16 = vals.astype(jnp.bfloat16)
            s_fn16 = jax.jit(lambda t, i, v: t.at[i].add(v.astype(jnp.float32)))
            dt = timeit(s_fn16, zero, idx, vals16)
            print(f"scatter-add {rows/1e6:.2f}M rows x 45 bf16->f32: "
                  f"{dt*1e3:.2f} ms", flush=True)
            # sorted indices
            idx_s = jnp.sort(idx)
            dt = timeit(s_fn, zero, idx_s, vals)
            print(f"scatter-add {rows/1e6:.2f}M SORTED rows x 45 f32: "
                  f"{dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
