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


def target_point():
    """Comm-volume model at the BENCH operating point (200k @ 800x800x39,
    VERDICT r3 #5): one evaluation per gauss extent on the virtual mesh —
    no wall-clock claims (virtual devices run serially, see module
    caveat) — recording what DOES transfer to hardware: all-gather volume
    (attributes + merged pair streams), per-band compositing work, and
    the derived ICI time vs the per-device compute estimate."""
    from gaussiangrasper_tpu.core.cameras import view_matrix
    from gaussiangrasper_tpu.models.gaussian_field import init_random
    from gaussiangrasper_tpu.models.model import GaussianSplatConfig
    from gaussiangrasper_tpu.ops.projection import project_gaussians
    from gaussiangrasper_tpu.parallel import make_mesh, tile_sharded_compositor
    from gaussiangrasper_tpu.parallel.tile_shard import derive_gather_budget

    n, wh, f = 200_000, 800, 32
    c = 3 + f + 1 + 3
    cfg = GaussianSplatConfig(feature_dim=f)
    key = jax.random.PRNGKey(0)
    field, alive = init_random(key, n, extent=4.0, feature_dim=f,
                               init_scale=0.02)
    field = field._replace(
        means=field.means * jnp.array([0.5, 0.5, 0.25])
        + jnp.array([0.0, 0.0, -3.0]))
    from gaussiangrasper_tpu.core.cameras import Camera

    cam = Camera.create(fx=1000.0, fy=1000.0, cx=wh / 2, cy=wh / 2,
                        camera_to_world=jnp.eye(4)[:3], width=wh, height=wh)
    vm = view_matrix(cam.camera_to_world)
    proj = jax.jit(lambda m, s, q: project_gaussians(
        m, s, q, vm, cam.fx, cam.fy, cam.cx, cam.cy, wh, wh, mask=alive))(
        field.means, jnp.exp(field.log_scales), field.quats)
    opac = jax.nn.sigmoid(field.opacity_logits)
    colors = jnp.concatenate(
        [jax.nn.sigmoid(field.sh_coeffs[:, 0]), field.features,
         proj.depths[:, None], jnp.zeros((n, 3))], axis=-1)
    bg = jnp.zeros(c)

    # measured single-chip facts (r4 xplane profile, docs/ROUND_NOTES.md):
    # compositing fwd+bwd kernels ~40 ms at 0.81M pairs on one v5e.
    KERNEL_MS_PER_MPAIR = 40.0 / 0.81
    ICI_GBPS = 90.0  # conservative effective all-gather BW per v5e chip

    print(f"\ntarget-point comm model: {n/1e3:.0f}k @ {wh}x{wh}x{c}ch "
          f"(attrs {11 + c} f32 cols/row, pairs 12 B)")
    print(f"{'gauss':>6} {'gathered rows':>14} {'attr MB/dev':>12} "
          f"{'pairs/band':>11} {'stream MB/dev':>14} {'ici ms':>7} "
          f"{'compute ms':>11} {'comm/compute':>13}")
    for g in (1, 2, 4, 8):
        if g > len(jax.devices()):
            break
        mesh = make_mesh(gauss=g, devices=jax.devices()[:g])
        budget = derive_gather_budget(alive, g)
        compositor = tile_sharded_compositor(mesh, gather_budget=budget)
        out = jax.jit(lambda: compositor(proj, colors, opac, bg, wh, wh,
                                         cfg.raster))()
        jax.block_until_ready(out["image"])
        bins = out["bins"]
        rows = int(bins.gathered_rows)
        attr_mb = rows * (11 + c) * 4 * (g - 1) / max(g, 1) / 1e6
        # each device's band composites ~pairs/g of the global pair count;
        # merged streams ship sorted (tile, depth, payload) = 12 B/pair
        # from every source to every band
        from gaussiangrasper_tpu.ops.rasterize import bin_gaussians

        gb = jax.jit(lambda: bin_gaussians(proj, wh, wh, cfg.raster,
                                           opacities=opac,
                                           build_table=False))()
        pairs = int(jnp.sum(jnp.minimum(
            gb.tile_count, cfg.raster.max_gaussians_per_tile)))
        band_pairs = pairs // max(g, 1)
        stream_mb = pairs * 12 * (g - 1) / max(g, 1) / 1e6
        ici_ms = (attr_mb + stream_mb) / 1e3 / ICI_GBPS * 1e3
        comp_ms = KERNEL_MS_PER_MPAIR * band_pairs / 1e6
        ratio = ici_ms / max(comp_ms, 1e-9)
        print(f"{g:>6} {rows:>14} {attr_mb:>12.2f} {band_pairs:>11} "
              f"{stream_mb:>14.2f} {ici_ms:>7.2f} {comp_ms:>11.1f} "
              f"{ratio:>13.2f}", flush=True)
    print("\n(>=90% scaling needs comm/compute < ~0.1 with overlap; "
          "ICI_GBPS is an estimate — hardware unavailable in this image)")


def main():
    if "--target" in sys.argv:
        target_point()
        return
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
