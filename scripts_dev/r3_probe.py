"""Round-3 perf probe: backend A/B + marshaling micro-benchmarks.

Usage: timeout 1500 python scripts_dev/r3_probe.py [--stages ab,ts,gather,sort]
Per the TPU protocol (CLAUDE.md): run in the background under timeout,
per-iteration sync medians, trivial dispatch first.
Safe under GGT_PLATFORM=cpu for a smoke run (GGT_PROBE_ITERS=1).
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

try:  # warm repeat probes (see bench.py)
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
    return times[len(times) // 2]


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
    p.add_argument("--stages", default="rtt,ab")
    args = p.parse_args()
    stages = set(args.stages.split(","))

    tiny = jnp.zeros((8,))
    f = jax.jit(lambda x: x + 1.0)
    dt = timeit(f, tiny)
    print(f"dispatch RTT: {dt*1e3:.2f} ms", flush=True)

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
        # Backend A/B at the bench operating point (fwd+bwd incl. binning).
        for backend in ("xla", "pallas"):
            cfg = RasterizeConfig(backend=backend)
            fn = jax.jit(jax.grad(render_loss, argnums=(0, 1, 2)),
                         static_argnums=(3,))
            dt = timeit(fn, proj, colors, opac, cfg)
            print(f"render fwd+bwd backend={backend}: {dt*1e3:.1f} ms",
                  flush=True)

    if "ts" in stages:
        # Tile-size sweep (pair volume vs per-tile pixel work trade).
        for ts_, k_, mt in ((16, 1024, 32), (32, 2048, 16), (32, 4096, 16),
                            (8, 512, 64)):
            cfg = RasterizeConfig(tile_size=ts_, max_gaussians_per_tile=k_,
                                  max_tiles_per_gaussian=mt, backend="xla")
            bins = jax.jit(lambda pr: bin_gaussians(pr, W, H, cfg,
                                                    opacities=opac))(proj)
            fn = jax.jit(jax.grad(render_loss, argnums=(0, 1, 2)),
                         static_argnums=(3,))
            dt = timeit(fn, proj, colors, opac, cfg)
            print(f"render fwd+bwd ts={ts_} K={k_} MT={mt}: {dt*1e3:.1f} ms "
                  f"(pairs={int(jnp.sum(jnp.minimum(bins.tile_count, k_)))}, "
                  f"mean/tile={float(jnp.mean(bins.tile_count)):.0f}, "
                  f"overflow={int(bins.overflow)}, "
                  f"dropped={int(bins.dropped_tiles)})", flush=True)

    if "ts2" in stages:
        # Backend x tile-size cross product (r3: pallas won at ts=16;
        # ts=32 won for the XLA walk — measure the combination).
        for backend, ts_, k_, mt in (
            ("pallas", 32, 2048, 16), ("pallas", 32, 1536, 16),
            ("xla", 32, 2048, 16), ("pallas", 16, 1024, 32),
        ):
            cfg = RasterizeConfig(tile_size=ts_, max_gaussians_per_tile=k_,
                                  max_tiles_per_gaussian=mt, backend=backend)
            bins = jax.jit(lambda pr, cfg=cfg: bin_gaussians(
                pr, W, H, cfg, opacities=opac))(proj)
            fn = jax.jit(jax.grad(render_loss, argnums=(0, 1, 2)),
                         static_argnums=(3,))
            dt = timeit(fn, proj, colors, opac, cfg)
            print(f"render fwd+bwd {backend} ts={ts_} K={k_} MT={mt}: "
                  f"{dt*1e3:.1f} ms (overflow={int(bins.overflow)})",
                  flush=True)

    if "mt" in stages:
        # MT sweep at ts=32/pallas: sort+build scale with N*MT; dropped
        # tiles are the correctness cost to watch.
        for mt in (16, 12, 10):
            cfg = RasterizeConfig(max_tiles_per_gaussian=mt, backend="pallas")
            bins = jax.jit(lambda pr, cfg=cfg: bin_gaussians(
                pr, W, H, cfg, opacities=opac))(proj)
            fn = jax.jit(jax.grad(render_loss, argnums=(0, 1, 2)),
                         static_argnums=(3,))
            dt = timeit(fn, proj, colors, opac, cfg)
            print(f"render fwd+bwd pallas ts=32 MT={mt}: {dt*1e3:.1f} ms "
                  f"(dropped={int(bins.dropped_tiles)}, "
                  f"overflow={int(bins.overflow)})", flush=True)

    if "v3" in stages:
        # Stage decomposition of the pair-stream (v3) backend + budget
        # sweep. Stage timings each pay the ~24 ms dispatch floor once;
        # the fused step pays it once total.
        from gaussiangrasper_tpu.ops import rasterize_pallas

        cfg = RasterizeConfig(backend="pallas")
        bin_fn = jax.jit(lambda pr: bin_gaussians(
            pr, W, H, cfg, opacities=opac, build_table=False,
            keep_pairs=True))
        dt = timeit(bin_fn, proj)
        bins = bin_fn(proj)
        print(f"v3 binning (sort+boundaries): {dt*1e3:.1f} ms "
              f"(B={bins.pair_gidx.shape[0]}, "
              f"pairs={int(jnp.sum(jnp.minimum(bins.tile_count, 2048)))}, "
              f"pair_overflow={int(bins.pair_overflow)})", flush=True)

        g_fn = jax.jit(lambda gi: rasterize_pallas._gather_pairs(
            gi, proj.xys, proj.conics, opac, colors, 2048))
        dt = timeit(g_fn, bins.pair_gidx)
        print(f"v3 pair gather ({bins.pair_gidx.shape[0]/1e6:.2f}M x 128): "
              f"{dt*1e3:.1f} ms", flush=True)

        tw_, th_ = (W + 31) // 32, (H + 31) // 32
        fwd_fn = jax.jit(lambda gi, st, tc: rasterize_pallas.composite_pair_stream(
            gi, st, tc, proj.xys, proj.conics, opac, colors, bg,
            tw_, 32, k_cap=2048)[0])
        dt = timeit(fwd_fn, bins.pair_gidx, bins.pair_starts, bins.tile_count)
        print(f"v3 fwd (gather+kernel): {dt*1e3:.1f} ms", flush=True)

        for pb in (0, 1536, 1280, 1024):
            cfg = RasterizeConfig(backend="pallas", pair_budget_per_tile=pb)
            bins_b = jax.jit(lambda pr, cfg=cfg: bin_gaussians(
                pr, W, H, cfg, opacities=opac, build_table=False,
                keep_pairs=True))(proj)
            fn = jax.jit(jax.grad(render_loss, argnums=(0, 1, 2)),
                         static_argnums=(3,))
            dt = timeit(fn, proj, colors, opac, cfg)
            print(f"v3 fwd+bwd pair_budget={pb or 'K'}: {dt*1e3:.1f} ms "
                  f"(B={bins_b.pair_gidx.shape[0]}, "
                  f"pair_overflow={int(bins_b.pair_overflow)})", flush=True)

    if "full" in stages:
        # Full-train-step overhead decomposition: what the bench pays on
        # top of render fwd+bwd (losses, projection, adam, refinement
        # stats). Stage numbers over-count dispatch overheads the fused
        # step pays once.
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

    if "sortkey" in stages:
        # two-key (i32 tile, f32 depth) vs packed single-key i64 sort.
        # NOTE: the packed variant needs JAX_ENABLE_X64=1 (int64 silently
        # truncates to int32 otherwise, making its timing meaningless);
        # adopting it repo-wide would force x64 globally, so it is only
        # worth pursuing if the win is large.
        packed_ok = jax.config.jax_enable_x64
        if not packed_ok:
            print("sortkey: x64 disabled - packed i64 timing SKIPPED",
                  flush=True)
        key = jax.random.PRNGKey(2)
        for n_pairs in (2_400_000, 3_200_000):
            kt = jax.random.randint(key, (n_pairs,), 0, 625, jnp.int32)
            kd = jax.random.uniform(key, (n_pairs,))
            payload = jax.random.randint(key, (n_pairs,), 0, N_GAUSS, jnp.int32)
            fn2 = jax.jit(lambda a, b, c: jax.lax.sort(
                (a, b, c), num_keys=2, is_stable=True))
            dt = timeit(fn2, kt, kd, payload)
            print(f"two-key sort {n_pairs/1e6:.1f}M: {dt*1e3:.2f} ms",
                  flush=True)

            if packed_ok:
                def packed(a, b, c):
                    # positive floats compare like their bit patterns
                    db = jax.lax.bitcast_convert_type(b, jnp.int32)
                    db = db.astype(jnp.int64) & 0xFFFFFFFF
                    k = (a.astype(jnp.int64) << 32) | db
                    return jax.lax.sort((k, c), num_keys=1, is_stable=True)

                fn1 = jax.jit(packed)
                dt = timeit(fn1, kt, kd, payload)
                print(f"packed i64 sort {n_pairs/1e6:.1f}M: {dt*1e3:.2f} ms",
                      flush=True)

    if "gather" in stages:
        key = jax.random.PRNGKey(1)
        idx = jax.random.randint(key, (2_560_000,), 0, N_GAUSS, jnp.int32)
        g_fn = jax.jit(lambda t, i: t[i])
        for cols_, dt_ in ((45, jnp.float32), (45, jnp.bfloat16),
                           (6, jnp.float32), (128, jnp.float32)):
            table = jax.random.normal(key, (N_GAUSS, cols_)).astype(dt_)
            dt = timeit(g_fn, table, idx)
            bytes_ = idx.shape[0] * cols_ * table.dtype.itemsize
            print(f"gather 2.56M rows x {cols_} {dt_.__name__}: "
                  f"{dt*1e3:.2f} ms ({bytes_/dt/1e9:.1f} GB/s)", flush=True)
        # sorted (near-monotone) indices vs random
        idx_s = jnp.sort(idx)
        table = jax.random.normal(key, (N_GAUSS, 45))
        dt = timeit(g_fn, table, idx_s)
        print(f"gather 2.56M SORTED rows x 45 f32: {dt*1e3:.2f} ms", flush=True)
        # the (T,K) build-style gather: int32 positions from a 6.4M array
        src = jax.random.randint(key, (6_400_000,), 0, N_GAUSS, jnp.int32)
        pos = jax.random.randint(key, (2_560_000,), 0, 6_400_000, jnp.int32)
        dt = timeit(g_fn, src, pos)
        print(f"gather 2.56M int32 from 6.4M: {dt*1e3:.2f} ms", flush=True)
        # scatter-add, the backward's counterpart
        s_fn = jax.jit(lambda t, i, v: t.at[i].add(v))
        vals = jax.random.normal(key, (2_560_000, 45))
        zero = jnp.zeros((N_GAUSS, 45))
        dt = timeit(s_fn, zero, idx, vals)
        print(f"scatter-add 2.56M rows x 45 f32: {dt*1e3:.2f} ms", flush=True)

    if "sort" in stages:
        key = jax.random.PRNGKey(2)
        for n_pairs in (6_400_000, 3_200_000):
            kt = jax.random.randint(key, (n_pairs,), 0, 2500, jnp.int32)
            kd = jax.random.normal(key, (n_pairs,))
            payload = jax.random.randint(key, (n_pairs,), 0, N_GAUSS, jnp.int32)
            fn = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2,
                                                      is_stable=True))
            dt = timeit(fn, kt, kd, payload)
            print(f"two-key stable sort {n_pairs/1e6:.1f}M pairs: "
                  f"{dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
