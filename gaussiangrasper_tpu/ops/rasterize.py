"""Tile-based differentiable rasterization of projected 2D Gaussians.

TPU-native replacement for the reference's CUDA `RasterizeGaussians` /
`NDRasterizeGaussians` (call sites /root/reference/nerfstudio/models/
gaussian_splatting.py:735-784). The reference launches FOUR CUDA rasterize
passes per step (rgb, feature, depth, normal) sharing one sort; here the
caller concatenates all channels and composites them in ONE pass.

Design (no atomics, no dynamic shapes — everything maps onto sort + prefix
sums + one big matmul, which is what the TPU is built for):

1. tile binning  — each Gaussian emits its covered tile rectangle (bounded
                   by `max_tiles_per_gaussian`), with pairs provably below
                   the 1/255 alpha cutoff pruned; ONE stable two-key sort
                   over (tile id, camera depth) with the Gaussian index as
                   payload yields depth-ordered per-tile segments, sliced
                   into fixed-capacity index lists [T, K]. Stable ties
                   fall back to original index order — the same semantics
                   as a stable global depth argsort (the CUDA kernel must
                   sort per-tile because its lists are built with atomics).
2. compositing   — per tile: alpha in closed form, transmittance via an
                   exclusive cumulative sum of log(1 - alpha) along K (the
                   associative-scan form of sequential front-to-back
                   blending, bit-equivalent in exact arithmetic), then the
                   weighted color sum is a single [P, K] @ [K, C] matmul on
                   the MXU. Tiles are processed in chunks under `lax.map`
                   with rematerialization, so peak memory is one chunk.

Sequential-semantics parity with the CUDA kernel:
- alpha = min(0.999, opac * exp(-sigma)); skipped if sigma < 0 or alpha < 1/255.
- a Gaussian is composited iff the running transmittance *after* it stays
  > 1e-4; the first one that would cross terminates the pixel (exactly the
  CUDA early-exit, expressed as a monotone mask on the cumulative product).
- background is blended with the terminal transmittance.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gaussiangrasper_tpu.ops.projection import ProjectedGaussians, project_gaussians

ALPHA_CLAMP = 0.999
ALPHA_CUTOFF = 1.0 / 255.0
TRANSMITTANCE_EPS = 1e-4
_LOG_EPS = -9.2103403719761836  # log(TRANSMITTANCE_EPS)


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    tile_size: int = 32
    """Pixel tile edge. Perf knob only — results are identical for any
    tile size >= inclusion granularity. 32 measured best on the v5e at
    the 800x800/200k bench point (r3 probe): the pair count scales as
    ~(splat_width/ts + 1)^2 and every binning stage (sort, index build,
    walk gathers) is PER-PAIR-bound on this TPU, so halving pairs beats
    the extra per-tile pixel work (render fwd+bwd 164 vs 212 ms)."""
    max_gaussians_per_tile: int = 2048
    """Per-tile capacity K. Overflow keeps the K nearest (front-most).
    2048 holds the dense-bench worst case at tile_size 32 with zero
    overflow (mean 1303/tile); the (T, K) table footprint matches the
    old 16/1024 default."""
    max_tiles_per_gaussian: int = 16
    """Cap on tiles one Gaussian may cover; 0 = the whole tile grid (exact
    but allocates an (N, num_tiles) pair matrix — only viable for small
    scenes). The binning pair sort runs over the N x MT grid, so this cap
    is the sort-cost knob: 16 covers a ~96x96 px splat at tile_size 32
    post alpha-cutoff shrink (cull_screen_size 0.15 keeps real splats
    under that). Oversized rectangles are truncated row-major and counted
    in TileBins.dropped_tiles — never silent."""
    tile_chunk: int = 8
    """Tiles composited per scan step. Smaller chunks sharpen the
    work-proportional path's early exit (the whole chunk walks to its
    slowest tile; occupancy sorting keeps chunks homogeneous), larger
    chunks feed the MXU bigger flat matmuls; 8 measured best fwd+bwd on
    the v5e at the 800x800/200k bench point (242 ms vs 248 at 32), with
    the fused-attrs slab gather flattening the old per-chunk overhead."""
    backend: str = "auto"
    """'pallas' (TPU kernel; interpreted elsewhere), 'xla' (pure lax, runs
    everywhere), or 'auto' (pallas on TPU, xla otherwise)."""
    pair_budget_per_tile: int = 1536
    """Static pair-stream budget B = T * pair_budget_per_tile (0 = use K,
    the per-tile walk clamp). B bounds the rows the pair-stream backend
    gathers/scatters (the per-ROW-cost ops, docs/ROUND_NOTES.md), while K
    bounds one tile's walk — the budget is a MEAN-occupancy knob, K a
    worst-case one. 1536 = 0.75*K holds the dense bench point (mean
    1303/tile) with zero overflow and saves ~5 ms over B = T*K (r3 v3
    probe); segments clipped by B are counted in TileBins.pair_overflow
    (surfaced in train metrics), never silent."""

    kernel_compute: str = "auto"
    """Pallas pair-stream matmul-input precision: 'f32' keeps every MXU
    input f32 (CUDA-exact, bit-matches the jnp oracle); 'bf16' casts the
    triangular-prefix and color-accumulation matmul INPUTS to bf16 with
    f32 accumulators and f32 walk carries (the r3 SSIM lesson: the
    two-carry log-transmittance math itself stays f32). The ATTRIBUTE
    STREAM stays f32 either way: bf16 would quantize splat centers by up
    to ~3 px at x~800 (8 mantissa bits) and row gathers cost per ROW,
    not per byte, on this TPU (r3 probe), so a half-width table buys
    nothing at the gather. 'auto' = f32: the r5 hardware A/B measured
    bf16 a WASH on device (fwd kernel 15.1 vs 14.8 ms, bwd 23.5 vs 23.7
    — the walk is VPU/transcendental-bound on its log1p/exp chains, not
    MXU-throughput-bound as the r4 budget assumed; docs/ROUND_NOTES.md
    round 5), so the quantization buys nothing here. The knob stays for
    hardware where the MXU is the wall. Env override: GGT_KERNEL_COMPUTE."""

    def resolved_kernel_compute(self) -> str:
        import os

        env = os.environ.get("GGT_KERNEL_COMPUTE")
        if env:
            return env
        if self.kernel_compute != "auto":
            return self.kernel_compute
        return "f32"

    def resolved_backend(self) -> str:
        if self.backend != "auto":
            return self.backend
        # 'auto' resolves to the Pallas kernels on real TPU and the XLA
        # walk elsewhere (Pallas interpret mode is orders of magnitude
        # slower than the walk on CPU). The round-3 marshaling redesign —
        # pair-stream kernels with whole-segment VMEM DMA staging — made
        # the Pallas backend win end-to-end (103.8 vs 164.9 ms render
        # fwd+bwd at the 800x800/200k bench, docs/ROUND_NOTES.md round-3
        # table; round 2 it lost 380 vs 266).
        from gaussiangrasper_tpu.ops.rasterize_pallas import _on_tpu

        return "pallas" if _on_tpu() else "xla"


class TileBins(NamedTuple):
    tile_gidx: Optional[jax.Array]  # (T, K) int32 indices into the N
    # arrays, -1 pad — or None when built with build_table=False (the
    # pair-stream backend reads pair_gidx/seg_starts instead)
    tile_count: jax.Array   # (T,) int32 number of valid entries (pre-clamp)
    num_tiles_hit: jax.Array  # (N,) int32 tiles covered per Gaussian
    overflow: jax.Array     # () int32 total entries dropped by K clamp
    dropped_tiles: jax.Array  # () int32 covered tiles dropped by the
    # max_tiles_per_gaussian cap (row-major truncation of oversized splats;
    # nonzero means some tiles rendered without every Gaussian that covers
    # them — surfaced in train metrics alongside `overflow`)
    pair_gidx: Optional[jax.Array] = None  # (B,) int32 depth-sorted pair
    # payload (Gaussian index per pair); garbage past the valid prefix
    pair_starts: Optional[jax.Array] = None  # (T,) int32 stream position
    # of each tile's first pair
    pair_overflow: Optional[jax.Array] = None  # () int32 pairs beyond the
    # static pair budget B (cap-and-report, like overflow)


def tile_grid(width: int, height: int, tile_size: int) -> Tuple[int, int]:
    tw = -(-width // tile_size)
    th = -(-height // tile_size)
    return tw, th


def tiles_cap(config: "RasterizeConfig", num_tiles: int) -> int:
    """Resolved per-Gaussian covered-tile cap MT (<=0 means the whole
    grid). The binning grid, the pair-stream guard, and the sort-reduce
    path must all agree on this value."""
    if config.max_tiles_per_gaussian <= 0:
        return num_tiles
    return min(config.max_tiles_per_gaussian, num_tiles)


_PRUNE_MARGIN = 1e-4
"""Safety margin (in sigma units) for the alpha-cutoff tile pruning: the
lower bound d^2/(2*lambda_max) is computed from cov2d while the composite
evaluates sigma from the conic; the margin absorbs their rounding skew."""


def enumerate_pairs(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    config: RasterizeConfig,
    opacities: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Enumerate candidate (gaussian, covered-tile) pairs.

    Returns (keys_tile (N*MT,) int32 with sentinel T for pruned/invalid
    pairs, keys_depth (N*MT,) f32, row_counts (N,) kept pairs per
    Gaussian, span (N,) pre-cap covered-tile counts). Shared by
    bin_gaussians and the distributed merge binning
    (parallel/tile_shard.py), so keep/prune decisions are bit-identical.

    When `opacities` is given, pairs whose alpha is provably below the
    1/255 compositing cutoff EVERYWHERE in the tile are pruned:
    alpha = opac * exp(-sigma) and sigma >= d^2 / (2*lmax) where d is the
    distance from the tile's pixel rect to the splat center and lmax the
    largest cov2d eigenvalue, so pairs with
    d^2 > 2*lmax*(log(255*opac) + margin) contribute exactly zero in the
    CUDA/oracle semantics and can be skipped. This both shrinks the bbox
    radius (the CUDA kernel bins a fixed 3-sigma square regardless of
    opacity, ref tile_bounds at gaussian_splatting.py:677-682) and rounds
    off the bbox corners — results are bit-identical, the per-tile lists
    just stop carrying dead entries.
    """
    ts = config.tile_size
    tw, th = tile_grid(width, height, ts)
    T = tw * th
    n = proj.xys.shape[0]
    MT = tiles_cap(config, T)

    xys = jax.lax.stop_gradient(proj.xys)
    radii = jax.lax.stop_gradient(proj.radii)
    depths = jax.lax.stop_gradient(proj.depths)
    alive = radii > 0.0

    x = xys[:, 0]
    y = xys[:, 1]
    r = radii
    alive_s = alive

    r_cut2 = None
    if opacities is not None:
        opac_s = jax.lax.stop_gradient(opacities)
        cov = jax.lax.stop_gradient(proj.cov2d)
        a_, b_, c_ = cov[:, 0], cov[:, 1], cov[:, 2]
        det = a_ * c_ - b_ * b_
        b_half = 0.5 * (a_ + c_)
        # same eigenvalue (and discriminant floor) as projection's radius
        lmax = b_half + jnp.sqrt(jnp.maximum(0.1, b_half * b_half - det))
        log_term = jnp.log(jnp.maximum(255.0 * opac_s, 1e-12)) + _PRUNE_MARGIN
        r_cut2 = 2.0 * lmax * jnp.maximum(log_term, 0.0)
        r = jnp.minimum(r, jnp.ceil(jnp.sqrt(r_cut2)))

    # Covered tile rectangle (same clamp arithmetic as the CUDA bbox helper).
    x0 = jnp.clip(jnp.floor((x - r) / ts), 0, tw).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((y - r) / ts), 0, th).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((x + r) / ts) + 1, 0, tw).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((y + r) / ts) + 1, 0, th).astype(jnp.int32)
    w_span = jnp.maximum(x1 - x0, 0)
    h_span = jnp.maximum(y1 - y0, 0)
    span = jnp.where(alive_s, w_span * h_span, 0)

    # Enumerate pairs (gaussian, covered-tile) with a static cap MT.
    j = jnp.arange(MT, dtype=jnp.int32)  # (MT,)
    w_safe = jnp.maximum(w_span, 1)[:, None]
    dx = j[None, :] % w_safe
    dy = j[None, :] // w_safe
    tx = x0[:, None] + dx
    ty = y0[:, None] + dy
    tid = ty * tw + tx  # (N, MT)
    keep = j[None, :] < jnp.minimum(span, MT)[:, None]
    if r_cut2 is not None:
        # circle-vs-pixel-rect: nearest pixel center of tile (tx, ty) to
        # the splat center (pixel centers sit at integer coordinates).
        px0 = (tx * ts).astype(x.dtype)
        py0 = (ty * ts).astype(y.dtype)
        ddx = jnp.maximum(jnp.maximum(px0 - x[:, None],
                                      x[:, None] - (px0 + (ts - 1))), 0.0)
        ddy = jnp.maximum(jnp.maximum(py0 - y[:, None],
                                      y[:, None] - (py0 + (ts - 1))), 0.0)
        keep = keep & (ddx * ddx + ddy * ddy <= r_cut2[:, None])

    row_counts = jnp.sum(keep, axis=1, dtype=jnp.int32)  # (N,)
    keys_tile = jnp.where(keep, tid, T).reshape(-1)
    keys_depth = jnp.broadcast_to(depths[:, None], (n, MT)).reshape(-1)
    return keys_tile, keys_depth, row_counts, span


def bin_gaussians(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    config: RasterizeConfig,
    opacities: Optional[jax.Array] = None,
    build_table: bool = True,
    keep_pairs: bool = False,
) -> TileBins:
    """Build fixed-capacity, depth-ordered per-tile Gaussian index lists
    (see enumerate_pairs for the pruning semantics)."""
    ts = config.tile_size
    tw, th = tile_grid(width, height, ts)
    T = tw * th
    n = proj.xys.shape[0]
    K = min(config.max_gaussians_per_tile, n)
    MT = tiles_cap(config, T)

    # Everything runs in ORIGINAL index order; depth ordering comes from
    # the pair sort itself — ONE stable two-key sort of the grid: primary
    # = tile id (sentinel T for pruned/invalid pairs), secondary = camera
    # depth, payload = the original Gaussian index. Stable ties fall back
    # to grid order = original index order, exactly the oracle's stable
    # depth argsort semantics. (Measured alternatives on the v5e: a
    # separate global depth argsort + column permutes each carry ~25 ms
    # of fixed sort/gather latency; a cumsum+scatter pair compaction was
    # slower than the 2x bigger sort it avoided.)
    keys_tile, keys_depth, row_counts, span = enumerate_pairs(
        proj, width, height, config, opacities
    )
    gidx_grid = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, MT)
    )
    n_pairs = n * MT
    sorted_tile, _, sorted_gidx = jax.lax.sort(
        (keys_tile, keys_depth, gidx_grid.reshape(-1)),
        num_keys=2, is_stable=True,
    )
    boundaries = jnp.searchsorted(
        sorted_tile, jnp.arange(T + 1, dtype=jnp.int32)
    )

    starts = boundaries[:-1]
    tile_count = (boundaries[1:] - starts).astype(jnp.int32)

    tile_gidx = None
    if build_table:
        # Slice out the first K (front-most) entries of each tile segment.
        pos2 = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
        in_seg = jnp.arange(K, dtype=jnp.int32)[None, :] < tile_count[:, None]
        pos2 = jnp.clip(pos2, 0, n_pairs - 1)
        tile_gidx = jnp.where(in_seg, sorted_gidx[pos2], -1)

    pair_gidx = pair_starts = pair_overflow = None
    if keep_pairs:
        # The pair-stream backend reads segments straight off the sorted
        # payload (rasterize_pallas.composite_pair_stream) — no (T, K)
        # build. Static budget B bounds the stream it may touch; the
        # valid prefix beyond B is reported, never silently dropped.
        pb = config.pair_budget_per_tile or K
        B = min(T * pb, n_pairs)
        pair_gidx = sorted_gidx[:B]
        pair_starts = starts.astype(jnp.int32)
        clamped = jnp.minimum(tile_count, K)
        walk_end = jnp.minimum(starts + clamped, B)
        pair_overflow = jnp.sum(
            clamped - jnp.maximum(walk_end - jnp.minimum(starts, B), 0)
        ).astype(jnp.int32)

    overflow = jnp.sum(jnp.maximum(tile_count - K, 0))
    dropped_tiles = jnp.sum(jnp.maximum(span - MT, 0)).astype(jnp.int32)
    # Binned tiles per Gaussian (post-prune/post-cap), original order.
    num_tiles_hit = row_counts
    return TileBins(
        tile_gidx=tile_gidx,
        tile_count=tile_count,
        num_tiles_hit=num_tiles_hit,
        overflow=overflow,
        dropped_tiles=dropped_tiles,
        pair_gidx=pair_gidx,
        pair_starts=pair_starts,
        pair_overflow=pair_overflow,
    )


def composite_weights(
    alpha: jax.Array, axis: int = -2
) -> Tuple[jax.Array, jax.Array]:
    """Closed-form front-to-back blending weights.

    Given per-(gaussian, pixel) alphas ordered front-to-back along `axis`,
    returns (weights, terminal_transmittance) replicating the sequential
    CUDA loop: w_k = alpha_k * prod_{j<k}(1-alpha_j), with compositing cut
    once transmittance would drop to <= 1e-4.
    """
    log_t = jnp.log1p(-alpha)  # log(1 - alpha); alpha <= 0.999 keeps it finite
    cum_incl = jnp.cumsum(log_t, axis=axis)
    t_next = jnp.exp(cum_incl)
    composite = t_next > TRANSMITTANCE_EPS  # monotone prefix mask
    t_before = jnp.exp(cum_incl - log_t)
    weights = jnp.where(composite, alpha * t_before, 0.0)
    t_final = jnp.exp(jnp.sum(jnp.where(composite, log_t, 0.0), axis=axis))
    return weights, t_final


def _tile_alpha(
    px: jax.Array,   # (TC, P)
    py: jax.Array,   # (TC, P)
    xy: jax.Array,   # (TC, K, 2)
    conic: jax.Array,  # (TC, K, 3)
    opac: jax.Array,   # (TC, K)
    valid: jax.Array,  # (TC, K) bool
) -> jax.Array:
    """Per-(tile, gaussian, pixel) alpha with the CUDA validity predicate."""
    dx = px[:, None, :] - xy[:, :, 0:1]  # (TC, K, P)
    dy = py[:, None, :] - xy[:, :, 1:2]
    sigma = (
        0.5 * (conic[:, :, 0:1] * dx * dx + conic[:, :, 2:3] * dy * dy)
        + conic[:, :, 1:2] * dx * dy
    )
    alpha = jnp.minimum(ALPHA_CLAMP, opac[:, :, None] * jnp.exp(-sigma))
    ok = valid[:, :, None] & (sigma >= 0.0) & (alpha >= ALPHA_CUTOFF)
    return jnp.where(ok, alpha, 0.0)


K_SLAB = 128
"""K-chunk walked per scan step in the XLA compositing path. Slab-wise
scanning keeps the (tiles, K, pixels) intermediates 8x smaller than the
naive full-K formulation (HBM traffic is the bottleneck) — the same walk
the Pallas kernels do in VMEM."""


def _composite_chunk(
    tile_ids: jax.Array,   # (TC,)
    tile_gidx: jax.Array,  # (TC, K)
    xys: jax.Array,        # (N, 2)
    conics: jax.Array,     # (N, 3)
    opacities: jax.Array,  # (N,)
    colors: jax.Array,     # (N, C)
    background: jax.Array,  # (C,)
    tw: int,
    ts: int,
) -> Tuple[jax.Array, jax.Array]:
    """Composite one chunk of tiles. Returns (out (TC, P, C), alpha (TC, P))."""
    TC, K = tile_gidx.shape
    P = ts * ts
    C = colors.shape[-1]
    dtype = xys.dtype

    # Pixel-center coordinates of this tile chunk (integer-centered).
    tx = (tile_ids % tw) * ts
    ty = (tile_ids // tw) * ts
    lin = jnp.arange(P, dtype=jnp.int32)
    px = (tx[:, None] + (lin % ts)[None, :]).astype(dtype)  # (TC, P)
    py = (ty[:, None] + (lin // ts)[None, :]).astype(dtype)

    kc = min(K_SLAB, K)
    n_slabs = -(-K // kc)
    pad = n_slabs * kc - K
    gidx = jnp.pad(tile_gidx, ((0, 0), (0, pad)), constant_values=-1)
    gidx = gidx.reshape(TC, n_slabs, kc).transpose(1, 0, 2)  # (S, TC, kc)

    def slab(carry, gi):
        # cum_all drives the cut test (monotone: once crossed, stays
        # crossed, matching the CUDA break); logt_comp accumulates only
        # composited entries and yields the terminal transmittance.
        accum, cum_all, logt_comp = carry  # (TC,P,C), (TC,P), (TC,P)
        valid = gi >= 0
        g = jnp.maximum(gi, 0)
        xy = xys[g]
        conic = conics[g]
        opac = jnp.where(valid, opacities[g], 0.0)
        col = colors[g]  # (TC, kc, C)
        alpha = _tile_alpha(px, py, xy, conic, opac, valid)  # (TC, kc, P)
        log_t = jnp.log1p(-alpha)
        cum = jnp.cumsum(log_t, axis=-2) + cum_all[:, None, :]
        composite = cum > _LOG_EPS
        t_before = jnp.exp(
            jnp.cumsum(log_t, axis=-2) - log_t + logt_comp[:, None, :]
        )
        w = jnp.where(composite, alpha * t_before, 0.0)
        accum = accum + jnp.einsum(
            "tkp,tkc->tpc", w, col, preferred_element_type=jnp.float32
        )
        cum_all = cum_all + jnp.sum(log_t, axis=-2)
        logt_comp = logt_comp + jnp.sum(
            jnp.where(composite, log_t, 0.0), axis=-2
        )
        return (accum, cum_all, logt_comp), None

    init = (jnp.zeros((TC, P, C), dtype), jnp.zeros((TC, P), dtype),
            jnp.zeros((TC, P), dtype))
    (accum, _, log_t), _ = jax.lax.scan(jax.checkpoint(slab), init, gidx)
    t_final = jnp.exp(log_t)
    out = accum + t_final[..., None] * background[None, None, :]
    return out, 1.0 - t_final


def rasterize_projected(
    proj: ProjectedGaussians,
    colors: jax.Array,
    opacities: jax.Array,
    background: jax.Array,
    width: int,
    height: int,
    config: RasterizeConfig = RasterizeConfig(),
    bins: Optional[TileBins] = None,
):
    """Rasterize already-projected Gaussians.

    Args:
      proj: output of `project_gaussians` (xys may carry a gradient probe).
      colors: (N, C) per-Gaussian channel values (RGB+feature+depth+normal
              concatenated by the model; any C works).
      opacities: (N,) post-sigmoid opacities.
      background: (C,) blended with terminal transmittance.

    Returns dict with image (H, W, C), alpha (H, W), and binning stats.
    """
    ts = config.tile_size
    tw, th = tile_grid(width, height, ts)
    T = tw * th
    P = ts * ts
    C = colors.shape[-1]

    backend = config.resolved_backend()
    if bins is None:
        # The pair-stream Pallas backend reads segments straight off the
        # sorted pair payload — skip the (T, K) tile_gidx build entirely
        # (a measured ~25 ms 1.3M-element gather at the bench point).
        pairs = backend == "pallas"
        bins = bin_gaussians(proj, width, height, config,
                             opacities=opacities, build_table=not pairs,
                             keep_pairs=pairs)

    TC = max(1, min(config.tile_chunk, T))
    n_chunks = -(-T // TC)
    T_pad = n_chunks * TC
    tile_ids = jnp.arange(T_pad, dtype=jnp.int32).reshape(n_chunks, TC)
    if bins.tile_gidx is not None:
        gidx_pad = jnp.pad(
            bins.tile_gidx, ((0, T_pad - T), (0, 0)), constant_values=-1
        ).reshape(n_chunks, TC, -1)

    if backend == "xla_scan":
        # Legacy full-capacity scan path (autodiff backward). Kept for A/B
        # regression against the work-proportional path below.
        @jax.checkpoint
        def chunk_fn(args):
            ids, gidx = args
            return _composite_chunk(
                ids, gidx, proj.xys, proj.conics, opacities, colors,
                background, tw, ts,
            )

        out, alpha_im = jax.lax.map(chunk_fn, (tile_ids, gidx_pad))
    elif backend == "pallas":
        from gaussiangrasper_tpu.ops import rasterize_pallas

        if bins.pair_gidx is not None:
            # Pair-stream marshaling (v3): one row gather of the sorted
            # pair attribute stream inside the custom_vjp forward, per-
            # tile segment DMA in the kernels, ONE scatter-add by the
            # pair payload in the backward. No (T, K) build anywhere.
            K = min(config.max_gaussians_per_tile, proj.xys.shape[0])
            MT = tiles_cap(config, T)
            out, alpha_im = rasterize_pallas.composite_pair_stream(
                bins.pair_gidx, bins.pair_starts, bins.tile_count,
                proj.xys, proj.conics, opacities, colors, background,
                tw, ts, k_cap=K, mt=MT,
                compute=config.resolved_kernel_compute(),
            )
        else:
            # Table path (v2): fused (T, K, A) gather inside the
            # custom_vjp forward, reverse kernel + ONE fused global
            # scatter-add backward (used when a prebuilt table bins is
            # passed in).
            out, alpha_im = rasterize_pallas.composite_binned(
                bins.tile_gidx, bins.tile_count, proj.xys, proj.conics,
                opacities, colors, background, tw, ts,
            )
        out = jnp.pad(out, ((0, T_pad - T), (0, 0), (0, 0)))
        alpha_im = jnp.pad(alpha_im, ((0, T_pad - T), (0, 0)))
        out = out.reshape(n_chunks, TC, P, C)
        alpha_im = alpha_im.reshape(n_chunks, TC, P)
    else:
        # "xla": work-proportional early-exit path with custom VJP; gathers
        # happen per-slab inside the walk, the backward is one reverse
        # walk per chunk plus one fused global scatter-add.
        from gaussiangrasper_tpu.ops import rasterize_xla

        out, alpha_im = rasterize_xla.composite_binned_xla(
            bins.tile_gidx, bins.tile_count, proj.xys, proj.conics,
            opacities, colors, background, tw, ts, tile_chunk=TC,
        )
        out = jnp.pad(out, ((0, T_pad - T), (0, 0), (0, 0)))
        alpha_im = jnp.pad(alpha_im, ((0, T_pad - T), (0, 0)))
        out = out.reshape(n_chunks, TC, P, C)
        alpha_im = alpha_im.reshape(n_chunks, TC, P)

    # (n_chunks, TC, P, C) -> crop tile padding -> (th, tw, ts, ts, C) -> (H, W, C)
    tiles = out.reshape(T_pad, P, C)[:T]
    out = tiles.reshape(th, tw, ts, ts, C).transpose(0, 2, 1, 3, 4)
    image = out.reshape(th * ts, tw * ts, C)[:height, :width]
    alpha_im = alpha_im.reshape(T_pad, P)[:T]
    alpha_im = alpha_im.reshape(th, tw, ts, ts).transpose(0, 2, 1, 3)
    alpha_image = alpha_im.reshape(th * ts, tw * ts)[:height, :width]

    return {
        "image": image,
        "alpha": alpha_image,
        "bins": bins,
        # pre-assembly (T, P, C) view of the same composited values
        # (same buffer as `image` pre-transpose; DCE'd when unused).
        # Tried as the source for the sampled-feature gather in r5 and
        # measured WORSE than gathering the assembled image (it adds a
        # dense (T, P, C) cotangent add; docs/ROUND_NOTES.md) — kept for
        # consumers that want tile-space access without the assembly.
        "tiles": tiles,
    }


def rasterize(
    means: jax.Array,
    scales: jax.Array,
    quats: jax.Array,
    opacities: jax.Array,
    colors: jax.Array,
    viewmat: jax.Array,
    fx,
    fy,
    cx,
    cy,
    width: int,
    height: int,
    background: Optional[jax.Array] = None,
    config: RasterizeConfig = RasterizeConfig(),
    mask: Optional[jax.Array] = None,
):
    """Project + bin + composite in one call (the simple API)."""
    proj = project_gaussians(
        means, scales, quats, viewmat, fx, fy, cx, cy, width, height, mask=mask
    )
    if background is None:
        background = jnp.zeros((colors.shape[-1],), colors.dtype)
    out = rasterize_projected(
        proj, colors, opacities, background, width, height, config
    )
    out["proj"] = proj
    return out
