"""Micro-decomposition of bin_gaussians phases at the bench point.

Usage: timeout 1200 python scripts_dev/bin_micro_probe.py
Times each phase as its own jitted function (boundaries force
materialization, so the sum exceeds the fused total — this is for
RANKING phases, not absolute accounting).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import os

import jax

if os.environ.get("GGT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GGT_PLATFORM"])

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))
from perf_probe import build_scene, timeit  # noqa: E402

N, W, H = 200_000, 800, 800
TS, MT, K = 16, 32, 1024


def main():
    from gaussiangrasper_tpu.core.cameras import view_matrix
    from gaussiangrasper_tpu.ops.projection import project_gaussians
    from gaussiangrasper_tpu.ops.rasterize import tile_grid

    field, alive, cam = build_scene()
    vm = view_matrix(cam.camera_to_world)
    proj = jax.jit(lambda m, s, q: project_gaussians(
        m, s, q, vm, cam.fx, cam.fy, cam.cx, cam.cy, W, H, mask=alive
    ))(field.means, jnp.exp(field.log_scales), field.quats)
    jax.block_until_ready(proj)
    tw, th = tile_grid(W, H, TS)
    T = tw * th
    opac = jax.nn.sigmoid(field.opacity_logits)

    # phase 1: depth argsort
    f_order = jax.jit(lambda d, r: jnp.argsort(
        jnp.where(r > 0, d, jnp.inf)).astype(jnp.int32))
    dt = timeit(f_order, proj.depths, proj.radii)
    print(f"argsort depths (200k): {dt*1e3:.2f} ms", flush=True)
    order = f_order(proj.depths, proj.radii)

    # phase 2: gather-by-order of the per-gaussian columns
    f_perm = jax.jit(lambda o: (proj.xys[o, 0], proj.xys[o, 1],
                                proj.radii[o], opac[o], proj.cov2d[o]))
    dt = timeit(f_perm, order)
    print(f"permute columns by order: {dt*1e3:.2f} ms", flush=True)
    x, y, r, op_s, cov = f_perm(order)

    # phase 3: grid enumeration + prune + pack (elementwise over N x MT)
    @jax.jit
    def f_grid(x, y, r, op_s, cov):
        a_, b_, c_ = cov[:, 0], cov[:, 1], cov[:, 2]
        det = a_ * c_ - b_ * b_
        b_half = 0.5 * (a_ + c_)
        lmax = b_half + jnp.sqrt(jnp.maximum(0.1, b_half * b_half - det))
        log_term = jnp.log(jnp.maximum(255.0 * op_s, 1e-12)) + 1e-4
        r_cut2 = 2.0 * lmax * jnp.maximum(log_term, 0.0)
        rr = jnp.minimum(r, jnp.ceil(jnp.sqrt(r_cut2)))
        x0 = jnp.clip(jnp.floor((x - rr) / TS), 0, tw).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor((y - rr) / TS), 0, th).astype(jnp.int32)
        x1 = jnp.clip(jnp.floor((x + rr) / TS) + 1, 0, tw).astype(jnp.int32)
        y1 = jnp.clip(jnp.floor((y + rr) / TS) + 1, 0, th).astype(jnp.int32)
        w_span = jnp.maximum(x1 - x0, 0)
        span = w_span * jnp.maximum(y1 - y0, 0)
        j = jnp.arange(MT, dtype=jnp.int32)
        w_safe = jnp.maximum(w_span, 1)[:, None]
        tx = x0[:, None] + j[None, :] % w_safe
        ty = y0[:, None] + j[None, :] // w_safe
        tid = ty * tw + tx
        keep = j[None, :] < jnp.minimum(span, MT)[:, None]
        px0 = (tx * TS).astype(x.dtype)
        py0 = (ty * TS).astype(y.dtype)
        ddx = jnp.maximum(jnp.maximum(px0 - x[:, None],
                                      x[:, None] - (px0 + TS - 1)), 0.0)
        ddy = jnp.maximum(jnp.maximum(py0 - y[:, None],
                                      y[:, None] - (py0 + TS - 1)), 0.0)
        keep = keep & (ddx * ddx + ddy * ddy <= r_cut2[:, None])
        rank = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None],
                                (N, MT))
        nb = 18
        return jnp.where(keep, (tid << nb) | rank, jnp.int32(T << nb))

    dt = timeit(f_grid, x, y, r, op_s, cov)
    print(f"grid enum + prune + pack (N x {MT}): {dt*1e3:.2f} ms", flush=True)
    packed = f_grid(x, y, r, op_s, cov)

    # phase 4: the sort itself
    f_sort = jax.jit(lambda p: jax.lax.sort(p.reshape(-1)))
    dt = timeit(f_sort, packed)
    print(f"single-key sort ({N*MT/1e6:.1f}M): {dt*1e3:.2f} ms", flush=True)
    skeys = f_sort(packed)

    # phase 5: boundaries + (T, K) list build
    @jax.jit
    def f_build(skeys, order):
        nb = 18
        srank = skeys & ((1 << nb) - 1)
        bounds = jnp.searchsorted(
            skeys, (jnp.arange(T + 1, dtype=jnp.int32) << nb))
        starts = bounds[:-1]
        cnt = (bounds[1:] - starts).astype(jnp.int32)
        pos2 = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
        in_seg = jnp.arange(K, dtype=jnp.int32)[None, :] < cnt[:, None]
        pos2 = jnp.clip(pos2, 0, N * MT - 1)
        return jnp.where(in_seg, order[srank[pos2]], -1), cnt

    dt = timeit(f_build, skeys, order)
    print(f"boundaries + (T,{K}) gidx build: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
