"""Stage-by-stage perf decomposition of the bench point (800x800, 200k).

Usage: timeout 1500 python scripts_dev/perf_probe.py [--stages a,b,...]
Prints one line per stage; each stage is individually timed (median of 5).
Safe under GGT_PLATFORM=cpu for a smoke run.
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

N_GAUSS = 200_000
W = H = 800
F = 32


def timeit(fn, *args, iters=5, warmup=2):
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
    p.add_argument("--stages", default="rtt,bin,fwd,fwdbwd")
    args = p.parse_args()
    stages = set(args.stages.split(","))

    if "rtt" in stages:
        # Fixed dispatch+sync cost through the tunnel: a trivial op.
        tiny = jnp.zeros((8,))
        f = jax.jit(lambda x: x + 1.0)
        dt = timeit(f, tiny)
        print(f"dispatch RTT (tiny op, per-iter sync): {dt*1e3:.2f} ms",
              flush=True)

    from gaussiangrasper_tpu.core.cameras import view_matrix
    from gaussiangrasper_tpu.models.model import GaussianSplatConfig
    from gaussiangrasper_tpu.ops.projection import project_gaussians
    from gaussiangrasper_tpu.ops.rasterize import (
        RasterizeConfig, bin_gaussians, rasterize_projected,
    )

    field, alive, cam = build_scene()
    mcfg = GaussianSplatConfig(feature_dim=F)
    vm = view_matrix(cam.camera_to_world)

    def project(means, scales, quats):
        return project_gaussians(means, scales, quats, vm, cam.fx, cam.fy,
                                 cam.cx, cam.cy, W, H, mask=alive)

    proj = jax.jit(project)(field.means, jnp.exp(field.log_scales), field.quats)
    jax.block_until_ready(proj)

    if "gather" in stages:
        # Row-gather microbenchmark: tables like the binned attribute gather.
        key = jax.random.PRNGKey(1)
        table = jax.random.normal(key, (N_GAUSS, 48))
        idx = jax.random.randint(key, (2_560_000,), 0, N_GAUSS, jnp.int32)

        g_fn = jax.jit(lambda t, i: t[i])
        dt = timeit(g_fn, table, idx)
        gb = idx.shape[0] * 48 * 4 / 1e9
        print(f"gather rows (2.56M x 48 f32): {dt*1e3:.2f} ms "
              f"({gb/dt:.1f} GB/s)", flush=True)

        idx8 = idx[: idx.shape[0] // 8]
        dt = timeit(g_fn, table, idx8)
        print(f"gather rows (320k x 48 f32): {dt*1e3:.2f} ms "
              f"({gb/8/dt:.1f} GB/s)", flush=True)

    if "proj" in stages:
        dt = timeit(jax.jit(project), field.means, jnp.exp(field.log_scales),
                    field.quats)
        print(f"projection fwd: {dt*1e3:.2f} ms", flush=True)

        def proj_loss(m, s, q):
            pr = project(m, s, q)
            return jnp.sum(pr.xys) + jnp.sum(pr.conics) + jnp.sum(pr.radii)

        dt = timeit(jax.jit(jax.grad(proj_loss, argnums=(0, 1, 2))),
                    field.means, jnp.exp(field.log_scales), field.quats)
        print(f"projection fwd+bwd: {dt*1e3:.2f} ms", flush=True)

    rcfg = RasterizeConfig()
    opac = jax.nn.sigmoid(field.opacity_logits)
    if "bin" in stages:
        for label, op in (("nopop", None), ("pruned", opac)):
            bin_fn = jax.jit(
                lambda pr, o=op: bin_gaussians(pr, W, H, rcfg, opacities=o)
            )
            dt = timeit(bin_fn, proj)
            bins = bin_fn(proj)
            print(f"binning {label}: {dt*1e3:.2f} ms  "
                  f"(pairs={int(jnp.sum(bins.tile_count))}, "
                  f"mean/tile={float(jnp.mean(bins.tile_count)):.0f}, "
                  f"max/tile={int(jnp.max(bins.tile_count))}, "
                  f"dropped={int(bins.dropped_tiles)})", flush=True)

    colors = jnp.concatenate(
        [jax.nn.sigmoid(field.sh_coeffs[:, 0]), field.features,
         proj.depths[:, None],
         jnp.zeros((N_GAUSS, 3))], axis=-1)
    bg = jnp.zeros((colors.shape[-1],))

    def composite(pr, col, op, tc):
        cfg = RasterizeConfig(tile_chunk=tc)
        out = rasterize_projected(pr, col, op, bg, W, H, cfg)
        return out["image"], out["alpha"]

    if "fwd" in stages:
        for tc in (8, 32, 64, 128):
            fn = jax.jit(lambda pr, c, o, tc=tc: composite(pr, c, o, tc))
            dt = timeit(fn, proj, colors, opac)
            print(f"composite fwd tc={tc}: {dt*1e3:.2f} ms", flush=True)

    if "fwdbwd" in stages:
        for tc in (8, 32, 64, 128):
            def loss(pr, c, o, tc=tc):
                img, al = composite(pr, c, o, tc)
                return jnp.mean(jnp.abs(img)) + 0.0 * jnp.mean(al)

            fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            dt = timeit(fn, proj, colors, opac)
            print(f"composite fwd+bwd tc={tc}: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
