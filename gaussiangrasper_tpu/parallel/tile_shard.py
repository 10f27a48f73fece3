"""Tile-sharded compositing with a frustum-culled all-gather (north star).

The round-1 sharded step kept the Gaussian field sharded over the "gauss"
mesh axis but composited every image tile with the FULL capacity-sized
field: XLA all-gathered all C rows to every device and one camera's
compositing work was not distributed at all (the reference's analogous
boundary is DDP at /root/reference/nerfstudio/pipelines/base_pipeline.py:
304, which shards only over cameras). This module distributes the render
itself:

  1. Each device projects ITS capacity shard (embarrassingly parallel —
     stays sharded, no communication).
  2. Each device compacts its *culled* survivors (radii > 0: alive, in
     frustum, det > 0) into a fixed `gather_budget`-row attribute table —
     dead capacity slots and off-screen Gaussians are never transmitted.
  3. ONE all-gather over "gauss" moves the compacted tables (the
     frustum-culled all-gather; its transpose is the psum-scatter of the
     attribute gradients, so the backward reduce rides the same ICI path).
  4. Each device bins + composites its own horizontal BAND of image tiles
     (a band is just a sub-image, so the single-device binning/compositing
     pipeline — including the alpha-cutoff pruning and the
     work-proportional walk — runs unchanged in band coordinates).
  5. Band images stitch back along the row axis via the out_specs; the
     loss consumes a row-sharded (H, W, C) image.

Exactness: capacity shards are contiguous, per-device compaction preserves
order, and the binning depth-sort is stable — the gathered subset is a
subsequence of the unsharded ordering, so images and gradients match the
single-device path bit-for-bit (tests/test_parallel.py asserts both) as
long as `gather_budget` is not exceeded. Overflow (a too-small budget)
drops the TAIL of each shard's survivors and is reported in
`bins.gather_overflow` — the same cap-and-report contract as the binning
caps (never silent).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 top-level API; fall back for older versions
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from gaussiangrasper_tpu.ops.projection import ProjectedGaussians
from gaussiangrasper_tpu.ops.rasterize import (
    RasterizeConfig,
    TileBins,
    enumerate_pairs,
    rasterize_projected,
    tile_grid,
    tiles_cap,
)


class ShardedBins(NamedTuple):
    """Aggregated binning stats for the sharded path (the full per-tile
    index lists stay device-local and are never materialized globally)."""

    overflow: jax.Array        # () int32, max over bands of K-cap overflow
    dropped_tiles: jax.Array   # () int32, summed over bands
    gathered_rows: jax.Array   # () int32, culled rows actually gathered
    gather_overflow: jax.Array  # () int32, rows dropped by gather_budget
    gathered_bytes: jax.Array  # () int32, bytes each device received
    merge_overflow: Optional[jax.Array] = None  # () int32, in-band pairs
    # dropped by the per-source band_pair_budget (merge binning only)


def derive_gather_budget(alive, d: int, *, margin: float = 1.25,
                         quantum: int = 128) -> int:
    """Static per-device gather budget from a CONCRETE alive mask.

    Layout-aware (round 4): capacity shards are CONTIGUOUS, and a freshly
    seeded field packs its alive slots into a capacity PREFIX — the old
    balanced-in-expectation ceil(total/d) budget silently overflowed
    shard 0 of any fresh field. The budget is therefore the max alive
    count over the d contiguous shards, times `margin` (headroom for
    drift until the next re-derivation), rounded up to `quantum` rows for
    lane alignment. Must run OUTSIDE jit (shapes are static); call sites
    re-derive after refinement changes the alive mask — the budget only
    changes when the rounded value moves, so recompiles are rare.
    Overflow (drift beyond the margin) drops the tail of a shard's
    survivors and is reported in bins.gather_overflow, the same
    cap-and-report contract as the binning caps."""
    import numpy as np

    mask = np.asarray(alive)
    cap_per_dev = mask.shape[0] // max(d, 1)
    worst = int(mask[: cap_per_dev * d].reshape(d, cap_per_dev).sum(1).max())
    budget = -(-int(worst * margin) // quantum) * quantum
    return max(quantum, min(budget, cap_per_dev))


def composite_tile_sharded(
    proj: ProjectedGaussians,
    colors: jax.Array,
    opacities: jax.Array,
    background: jax.Array,
    width: int,
    height: int,
    config: RasterizeConfig = RasterizeConfig(),
    *,
    mesh: Mesh,
    axis: str = "gauss",
    gather_budget: Optional[int] = None,
    bin_mode: str = "merge",
    band_pair_budget: Optional[int] = None,
):
    """Drop-in replacement for `rasterize_projected` that shards the
    compositing over `axis`. All N-leading inputs must be sharded (or
    shardable) over `axis` on dim 0; returns the same dict contract with
    a row-sharded image and a `ShardedBins` summary.

    gather_budget: per-device cap on culled survivors entering the
    all-gather. None = the full shard size (exact for any input, but
    transmits dead slots too); smaller budgets bound ICI traffic and
    report drops in `bins.gather_overflow`.

    bin_mode:
      "merge" (default) — bin ONCE, distributed (round-3): each device
        enumerates + sorts only ITS shard's survivor pairs (a 1/D-size
        sort), the sorted pair streams ride the same all-gather as the
        attributes, and each band extracts its in-band slice from every
        source stream (contiguous dynamic slices — streams are
        tile-sorted) and merges them with one (tile, depth, global-index)
        three-key sort, also 1/D-size. Total order == the single-device
        stable (tile, depth) order because the global index encodes
        (shard, compaction rank) = original index order, so images and
        gradients still bit-match the unsharded path. Replaces the
        round-2 scheme where every band re-sorted the full N*MT grid
        (the admitted D x duplicated sort).
      "replicated" — the round-2 behavior (each band runs the full
        binning on the gathered set); kept for A/B.

    band_pair_budget: per-source cap on in-band pairs during extraction
    (merge mode). None = 1.25x the balanced share, rounded to 128 (the
    round-4 sweep at bench-like occupancy measured ZERO overflow even at
    1.0x and shorter walls at smaller budgets, docs/ROUND_NOTES.md; the
    1.25 margin matches derive_gather_budget's). Overflow is reported in
    bins.merge_overflow — cap-and-report, never silent.
    """
    n = proj.xys.shape[0]
    d = mesh.shape[axis]
    c = colors.shape[-1]
    if n % d != 0:
        raise ValueError(f"capacity {n} not divisible by {axis}={d}")
    nl = n // d
    v = min(gather_budget or nl, nl)

    ts = config.tile_size
    tw, th = tile_grid(width, height, ts)
    th_pad = -(-th // d) * d
    hb = (th_pad // d) * ts  # band height in pixels


    # attribute layout: xy(2) depth(1) conic(3) cov2d(3) radius(1) opac(1) color(C)
    a_dim = 11 + c
    T = tw * th
    t_band = (th_pad // d) * tw  # tiles per band (global ids contiguous)
    mt = tiles_cap(config, T)
    k_cap = min(config.max_gaussians_per_tile, d * v)
    if band_pair_budget is None:
        # 1.25x the balanced share of one source's pairs landing in one
        # band (swept round 4 — see docstring)
        band_pair_budget = max(128, -(-(5 * v * mt) // (4 * d * 128)) * 128)
    bpb = band_pair_budget

    def merge_binned_band(buf, band, lo):
        """Distributed bin-once: local sort of this shard's pairs runs on
        every device for ITS OWN survivors (before any band logic); the
        sorted streams are all-gathered and each band merges its slices."""
        local_proj = ProjectedGaussians(
            xys=buf[:, 0:2], depths=buf[:, 2], conics=buf[:, 3:6],
            radii=buf[:, 9], cov2d=buf[:, 6:9],
        )
        kt, kd, _, span = enumerate_pairs(
            local_proj, width, height, config, buf[:, 10]
        )
        rows = jnp.broadcast_to(
            jnp.arange(v, dtype=jnp.int32)[:, None], (v, mt)
        ).reshape(-1)
        st, sd, sp = jax.lax.sort((kt, kd, rows), num_keys=2, is_stable=True)
        g_t = jax.lax.all_gather(st, axis)  # (d, v*mt)
        g_d = jax.lax.all_gather(sd, axis)
        g_p = jax.lax.all_gather(sp, axis)

        hi = jnp.minimum(lo + t_band, T)

        def extract(row_t, row_d, row_p):
            a = jnp.searchsorted(row_t, lo)
            b = jnp.searchsorted(row_t, hi)
            take = jnp.minimum(b - a, bpb)
            tt = jax.lax.dynamic_slice_in_dim(row_t, a, bpb)
            dd = jax.lax.dynamic_slice_in_dim(row_d, a, bpb)
            pp = jax.lax.dynamic_slice_in_dim(row_p, a, bpb)
            i = jnp.arange(bpb, dtype=jnp.int32)
            tt = jnp.where(i < take, tt, T)
            return tt, dd, pp, jnp.maximum(b - a - bpb, 0)

        # pad streams so the dynamic slice never clips its window
        padd = lambda x, val: jnp.pad(x, ((0, 0), (0, bpb)),
                                      constant_values=val)
        tt, dd, pp, ovf = jax.vmap(extract)(
            padd(g_t, T), padd(g_d, 0.0), padd(g_p, 0)
        )
        gg = pp + (jnp.arange(d, dtype=jnp.int32) * v)[:, None]
        m_t, _, m_g = jax.lax.sort(
            (tt.reshape(-1), dd.reshape(-1), gg.reshape(-1)), num_keys=3
        )
        bt = m_t - lo  # band-relative tile ids (sentinels stay large)
        boundaries = jnp.searchsorted(
            bt, jnp.arange(t_band + 1, dtype=jnp.int32)
        )
        starts_b = boundaries[:-1].astype(jnp.int32)
        counts_b = (boundaries[1:] - boundaries[:-1]).astype(jnp.int32)

        if config.resolved_backend() == "pallas":
            tile_gidx = None
            # pair_overflow is structurally zero here: the merged band
            # stream has static size d*bpb and every valid segment lies
            # inside it (starts/counts come from searchsorted over the
            # same stream), so composite_pair_stream's B clamp never
            # clips. The band path's only pair clamp is the per-source
            # extraction budget bpb, whose drops are counted in
            # merge_overflow (never this field) — config.
            # pair_budget_per_tile does not apply to band streams.
            pair_fields = dict(pair_gidx=m_g, pair_starts=starts_b,
                               pair_overflow=jnp.zeros((), jnp.int32))
        else:
            pos2 = starts_b[:, None] + jnp.arange(k_cap, dtype=jnp.int32)
            in_seg = jnp.arange(k_cap, dtype=jnp.int32)[None, :] < counts_b[:, None]
            pos2 = jnp.clip(pos2, 0, m_g.shape[0] - 1)
            tile_gidx = jnp.where(in_seg, m_g[pos2], -1)
            pair_fields = {}
        bins = TileBins(
            tile_gidx=tile_gidx,
            tile_count=counts_b,
            num_tiles_hit=jnp.zeros((d * v,), jnp.int32),
            overflow=jnp.sum(jnp.maximum(counts_b - k_cap, 0)),
            dropped_tiles=jnp.sum(jnp.maximum(span - mt, 0)).astype(jnp.int32),
            **pair_fields,
        )
        return bins, jnp.sum(ovf)

    def shard_fn(xys, depths, conics, radii, cov2d, cols, opac, bg):
        # -- 2. compact culled survivors (order-preserving) --
        vis = radii > 0.0
        attrs = jnp.concatenate(
            [xys, depths[:, None], conics, cov2d, radii[:, None],
             opac[:, None], cols], axis=-1,
        )  # (nl, A)
        pos = jnp.cumsum(vis) - vis
        idx = jnp.where(vis, pos, v)
        buf = jnp.zeros((v, a_dim), attrs.dtype).at[idx].set(
            jnp.where(vis[:, None], attrs, 0.0), mode="drop"
        )
        local_count = jnp.sum(vis, dtype=jnp.int32)
        local_overflow = jnp.maximum(local_count - v, 0)

        band = jax.lax.axis_index(axis)
        lo = (band * t_band).astype(jnp.int32)
        band_bins = None
        merge_ovf = jnp.zeros((), jnp.int32)
        if bin_mode == "merge":
            band_bins, merge_ovf = merge_binned_band(buf, band, lo)

        # -- 3. the frustum-culled all-gather --
        g = jax.lax.all_gather(buf, axis, tiled=True)  # (d*v, A)

        # -- 4. composite this device's tile band --
        y_off = (band * hb).astype(g.dtype)
        gproj = ProjectedGaussians(
            xys=g[:, 0:2] - jnp.array([0.0, 1.0], g.dtype) * y_off,
            depths=g[:, 2],
            conics=g[:, 3:6],
            radii=g[:, 9],
            cov2d=g[:, 6:9],
        )
        out = rasterize_projected(
            gproj, g[:, 11:], g[:, 10], bg, width, hb, config,
            bins=band_bins,
        )
        bins = out["bins"]
        stats = (
            jax.lax.pmax(bins.overflow, axis),
            jax.lax.psum(bins.dropped_tiles, axis),
            jax.lax.psum(local_count, axis),
            jax.lax.psum(local_overflow, axis),
            jax.lax.psum(merge_ovf, axis),
        )
        return out["image"], out["alpha"], stats

    spec_n = P(axis)      # shard dim 0 over the gauss axis
    spec_rep = P()
    out_img = P(axis)     # bands stack along rows
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec_n, spec_n, spec_n, spec_n, spec_n, spec_n, spec_n,
                  spec_rep),
        out_specs=(out_img, out_img,
                   (spec_rep, spec_rep, spec_rep, spec_rep, spec_rep)),
        check_vma=False,
    )
    image, alpha, stats = fn(
        proj.xys, proj.depths, proj.conics, proj.radii, proj.cov2d,
        colors, opacities, background,
    )
    image = image[:height]
    alpha = alpha[:height]
    overflow, dropped, gathered_rows, gather_overflow, merge_ovf = stats
    bins = ShardedBins(
        overflow=overflow,
        dropped_tiles=dropped,
        gathered_rows=gathered_rows,
        gather_overflow=gather_overflow,
        gathered_bytes=gathered_rows * (a_dim * 4) * (d - 1) // d,
        merge_overflow=merge_ovf,
    )
    return {"image": image, "alpha": alpha, "bins": bins}


def tile_sharded_compositor(mesh: Mesh, axis: str = "gauss",
                            gather_budget: Optional[int] = None,
                            bin_mode: str = "merge",
                            band_pair_budget: Optional[int] = None):
    """A `compositor` for models.model.render: returns a callable with the
    rasterize_projected signature bound to the mesh."""
    return partial(
        composite_tile_sharded, mesh=mesh, axis=axis,
        gather_budget=gather_budget, bin_mode=bin_mode,
        band_pair_budget=band_pair_budget,
    )
