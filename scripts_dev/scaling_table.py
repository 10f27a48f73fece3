"""Relative scaling of the tile-sharded render on the virtual CPU mesh.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 GGT_PLATFORM=cpu \
      timeout 1200 python scripts_dev/scaling_table.py

Times a full render fwd+bwd at gauss in {1, 2, 4, 8} with the tile-sharded
compositor (parallel/tile_shard.py) and prints a table: step time,
speedup vs gauss=1, and the culled all-gather volume.

CAVEAT (measured): the virtual host-platform devices execute their
programs on the SAME host without true device concurrency, so wall-clock
speedup here is bounded near 1x regardless of how well the work shards
(pinning intra-op threads to 1 makes gauss=4/8 ~1.8x SLOWER than gauss=1,
i.e. devices run serially and only the per-band duplication shows). The
table is therefore a correctness + communication-volume artifact: the
per-device compositing work and the gathered bytes are what transfer to a
real multi-chip slice, where the all-gather rides ICI.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if os.environ.get("GGT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GGT_PLATFORM"])

import jax.numpy as jnp

N, W, H, C = 40_000, 512, 384, 8


def main():
    import tests.test_rasterize as R  # reuse the random-scene builder
    from gaussiangrasper_tpu.ops.rasterize import RasterizeConfig
    from gaussiangrasper_tpu.parallel import make_mesh, tile_sharded_compositor

    scene = R.make_scene(jax.random.key(0), N, width=W, height=H,
                         n_channels=C)
    proj = R.project_scene(scene)
    bg = jnp.zeros(C)
    cfg = RasterizeConfig(tile_chunk=8)
    target = jax.random.uniform(jax.random.key(1), (H, W, C))

    rows = []
    for g in (1, 2, 4, 8):
        if g > len(jax.devices()):
            break
        mesh = make_mesh(gauss=g, devices=jax.devices()[:g])
        compositor = tile_sharded_compositor(mesh)

        @jax.jit
        def fwd_bwd(xys, conics, opac, colors):
            def loss(xys, conics, opac, colors):
                p = proj._replace(xys=xys, conics=conics)
                out = compositor(p, colors, opac, bg, W, H, cfg)
                return jnp.mean(jnp.abs(out["image"] - target)), out["bins"]

            (l, bins), grads = jax.value_and_grad(
                loss, argnums=(0, 1, 2, 3), has_aux=True)(
                xys, conics, opac, colors)
            return l, bins, grads

        args = (proj.xys, proj.conics, scene["opacities"], scene["colors"])
        out = fwd_bwd(*args)
        jax.block_until_ready(out)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fwd_bwd(*args)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        times.sort()
        dt = times[len(times) // 2]
        bins = out[1]
        rows.append((g, dt, int(bins.gathered_rows), int(bins.gathered_bytes)))

    base = rows[0][1]
    print(f"\ntile-sharded render fwd+bwd, {N} gaussians @ {W}x{H}x{C} "
          f"(virtual CPU mesh)")
    print(f"{'gauss':>6} {'ms/step':>9} {'speedup':>8} "
          f"{'gathered rows':>14} {'gathered MB/dev':>16}")
    for g, dt, rows_g, bytes_g in rows:
        print(f"{g:>6} {dt * 1e3:>9.1f} {base / dt:>8.2f} "
              f"{rows_g:>14} {bytes_g / 1e6:>16.3f}")


if __name__ == "__main__":
    main()
