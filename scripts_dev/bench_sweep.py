"""Developer sweep: pixels/s across rasterizer knobs (not the driver bench).

Usage: timeout 1700 python scripts_dev/bench_sweep.py [--small]
Prints one line per config; safe to ctrl-C between configs.
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


def measure(n_gauss, width, height, feature_dim, raster_kwargs, iters=5):
    from gaussiangrasper_tpu.core.cameras import Camera
    from gaussiangrasper_tpu.models.gaussian_field import init_random
    from gaussiangrasper_tpu.models.model import GaussianSplatConfig, render
    from gaussiangrasper_tpu.ops.rasterize import RasterizeConfig

    key = jax.random.PRNGKey(0)
    field, alive = init_random(
        key, n_gauss, extent=4.0, feature_dim=feature_dim, init_scale=0.02
    )
    field = field._replace(
        means=field.means * jnp.array([0.5, 0.5, 0.25]) + jnp.array([0.0, 0.0, -3.0])
    )
    cam = Camera.create(width * 1.25, width * 1.25, width / 2, height / 2,
                        jnp.eye(4)[:3], width, height)
    cfg = GaussianSplatConfig(
        feature_dim=feature_dim, raster=RasterizeConfig(**raster_kwargs)
    )
    target = jnp.zeros((height, width, 3))

    @jax.jit
    def fwd_bwd(f):
        def loss(ff):
            out = render(ff, alive, cam, 0, cfg)
            return jnp.mean(jnp.abs(out["rgb"] - target)) + 0.0 * jnp.mean(
                out["feature"]
            )

        return jax.value_and_grad(loss)(f)

    l, g = fwd_bwd(field)
    jax.block_until_ready((l, g))
    t0 = time.perf_counter()
    for _ in range(iters):
        l, g = fwd_bwd(field)
    jax.block_until_ready((l, g))
    dt = (time.perf_counter() - t0) / iters
    return width * height / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true")
    p.add_argument("--backend", default=None)
    args = p.parse_args()

    n, w, h, f = (20000, 256, 256, 8) if args.small else (200000, 800, 800, 32)
    grids = [
        # the work-proportional backend favors small chunks (early exit
        # sharpness) — 8 is the measured v5e sweet spot
        {"tile_chunk": 4, "max_gaussians_per_tile": 1024},
        {"tile_chunk": 8, "max_gaussians_per_tile": 1024},
        {"tile_chunk": 16, "max_gaussians_per_tile": 1024},
        {"tile_chunk": 32, "max_gaussians_per_tile": 1024},
        {"tile_chunk": 8, "max_gaussians_per_tile": 512},
        {"tile_chunk": 8, "max_gaussians_per_tile": 2048},
        {"tile_chunk": 8, "max_gaussians_per_tile": 1024, "tile_size": 32,
         "max_tiles_per_gaussian": 16},
    ]
    for kw in grids:
        if args.backend:
            kw = dict(kw, backend=args.backend)
        try:
            px = measure(n, w, h, f, kw)
            print(f"{kw} -> {px/1e6:.3f} Mpx/s", flush=True)
        except Exception as e:
            print(f"{kw} -> FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
