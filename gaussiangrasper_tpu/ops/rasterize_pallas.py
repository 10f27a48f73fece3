"""Pallas TPU kernels for per-tile front-to-back compositing.

The XLA compositing path (ops/rasterize_xla.py) walks K-slabs with one
HBM round-trip per intermediate per slab — correct and work-proportional,
but every slab's elementwise chain (alpha, log1p, exp, masks, blends)
costs HBM traffic and per-op overhead at small sizes. These kernels keep
the whole per-tile walk in VMEM — the same work-proportionality the
reference's CUDA kernel gets from its per-tile loop (gsplat's
RasterizeGaussians, call sites /root/reference/nerfstudio/models/
gaussian_splatting.py:735-784) plus the fusion CUDA gets for free.

Marshaling contract (round 3 — the round-2 backend lost to the XLA walk
because it pre-gathered tables OUTSIDE the custom_vjp and back-propagated
through the gathers, materializing a second (T, K, A) gradient and a
scatter XLA scheduled poorly):
  - `composite_pair_stream` is the PRODUCTION entry (the "v3" pair-stream
    marshaling, see the section comment further down): ONE row gather of
    the depth-sorted pair attribute stream inside the custom_vjp forward,
    whole-segment VMEM DMA staging per tile, ONE reverse-walk backward
    kernel (round 4), and ONE global scatter-add by the sorted pair
    payload in the backward.
  - `composite_binned` is the table-path compat entry: it takes (T, K)
    binning index lists, performs ONE fused row gather of a packed
    (T, K, A) attribute table inside its custom_vjp forward, and its
    backward runs a reverse kernel into a fused (T, K, A) gradient table
    followed by ONE global scatter-add. Attribute columns: xy(2)
    conic(3) opac(1) color(C), A = 6 + C — matching
    ops/rasterize_xla.py:_pack_attrs.

Gradient identities (out = sum_k w_k c_k + T_final*bg,
w_k = alpha_k * prod_{j<k}(1-alpha_j), cut mask folded into alpha):
  dL/dc_k      = sum_p w_kp g_out[p]
  dL/dalpha_kp = T_before*<c_k, g> - suffix_k/(1-alpha)
                 - (<bg, g_out[p]> - g_alpha_p) * T_final/(1-alpha)
with suffix_k = sum_{j>k} w_j <c_j, g>; then the EWA chain
  alpha = min(.999, o*exp(-sigma)):  do = exp(-sigma)*dalpha,
  dsigma = -o*exp(-sigma)*dalpha  (0 where clamped/cut/invalid)
  sigma = .5(A dx^2 + C dy^2) + B dx dy, dx = px - x_k:
  dA = .5 dx^2 dsigma, dB = dx dy dsigma, dC = .5 dy^2 dsigma,
  dx_k = (A dx + B dy) dsigma, dy_k = (B dx + C dy) dsigma.

Cumulative sums use a lower-triangular ones matmul (MXU) rather than a
sublane scan — guaranteed-supported and effectively free at KC=128.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

ALPHA_CLAMP = 0.999
ALPHA_CUTOFF = 1.0 / 255.0
LOG_EPS = -9.2103403719761836  # log(1e-4), the transmittance cut

KC = int(_os.environ.get("GGT_KC", "128"))
"""K-chunk walked per loop iteration. The prefix matmuls cost
2*KC*pairs*P MACs total (the (KC,KC) triangular matmul per chunk), so
smaller KC trades prefix FLOPs against per-chunk loop overhead and MXU
utilization — env-tunable for probing (scripts_dev/r4_probe.py)."""


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _pixel_coords(t, tw: int, ts: int, dtype):
    """(1, P) pixel-center x and y for tile id t."""
    p = ts * ts
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = ((t % tw) * ts + lin % ts).astype(dtype)
    py = ((t // tw) * ts + lin // ts).astype(dtype)
    return px, py


def _tri(dtype):
    """(KC, KC) lower-triangular ones (incl. diagonal): cumsum-by-matmul."""
    return (
        jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 0)
        >= jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 1)
    ).astype(dtype)


UNROLL = int(_os.environ.get("GGT_UNROLL", "1"))
"""K-chunks per walk-loop iteration in the pair-stream kernels.
UNROLL=2 hoists two carry-independent chunk fronts (alpha chain + prefix
matmul) per iteration so their MXU latencies could overlap — MEASURED
SLOWER on the v5e (render fwd+bwd 100.7 vs 96.8 ms, r4 probe
2026-08-21): Mosaic's software pipeliner already overlaps consecutive
fori_loop iterations, so the manual unroll only adds live-range pressure
(the first attempt VMEM-OOM'd at 16 MiB scoped) and tail recompute.
Kept for A/B; results are BIT-identical either way."""

PREFIX_IMPL = _os.environ.get("GGT_PREFIX", "matmul")
"""In-kernel prefix-sum implementation along the KC axis:
  'matmul' — (KC, KC) triangular-ones matmul on the MXU (default).
  'shift'  — log-depth Hillis–Steele (7 shifted adds via zero-concat +
             static slice). ~1 MF/chunk vs the matmul's 33.5 MF — and
             still MEASURED SLOWER on the v5e (render fwd+bwd 107.8 vs
             97.0 ms at the 800x800/200k bench, r4 probe 2026-08-21):
             Mosaic lowers the sublane shifts as 7 dependent full-block
             copies, while the MXU eats the 128x128 matmul below the
             walk's VPU/DMA critical path. Kept for A/B.
Summation order differs between the two (parallel tree vs MXU
accumulation), so results differ only in ~1 ulp rounding."""


def _prefix_incl(v):
    """Inclusive prefix sum along axis 0 of a (KC, P) block."""
    s = 1
    while s < KC:
        z = jnp.zeros((s,) + v.shape[1:], v.dtype)
        v = v + jnp.concatenate([z, v[: KC - s]], axis=0)
        s *= 2
    return v


def _suffix_incl(v):
    """Inclusive suffix sum along axis 0 of a (KC, P) block."""
    s = 1
    while s < KC:
        z = jnp.zeros((s,) + v.shape[1:], v.dtype)
        v = v + jnp.concatenate([v[s:], z], axis=0)
        s *= 2
    return v


def _slab_unpack(a, c: int):
    """Split a (KC, A) fused-attribute slab into its columns."""
    xy = a[:, 0:2]
    con = a[:, 2:5]
    opac = a[:, 5:6]
    col = a[:, 6 : 6 + c]
    return xy, con, opac, col


def _chunk_alpha(xy, con, opac, px, py):
    """alpha (KC, P) for one K-chunk against the tile's pixels, with the
    CUDA validity predicate (sigma >= 0, alpha >= 1/255, clamp at 0.999)
    pre-applied. Returns (alpha, dx, dy, sigma) for reuse in backward."""
    dx = px - xy[:, 0:1]  # (KC, P)
    dy = py - xy[:, 1:2]
    a_ = con[:, 0:1]
    b_ = con[:, 1:2]
    c_ = con[:, 2:3]
    sigma = 0.5 * (a_ * dx * dx + c_ * dy * dy) + b_ * dx * dy
    raw = opac * jnp.exp(-sigma)  # opac is (KC, 1)
    alpha = jnp.minimum(ALPHA_CLAMP, raw)
    ok = (sigma >= 0.0) & (alpha >= ALPHA_CUTOFF)
    return jnp.where(ok, alpha, 0.0), dx, dy, sigma


def _fwd_kernel(
    counts_ref,  # scalar prefetch (T,)
    attrs_ref, bg_ref,
    out_ref, alpha_ref, logt_ref,
    *, tw: int, ts: int, c: int,
):
    t = pl.program_id(0)
    count = counts_ref[t]
    p = ts * ts
    dtype = out_ref.dtype
    px, py = _pixel_coords(t, tw, ts, dtype)
    tri = _tri(dtype)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (KC, 1), 0)
    n_chunks = pl.cdiv(count, KC)

    def body(i, state):
        # cum_all drives the cut test (monotone across the whole walk,
        # matching the CUDA break); logt_comp sums only composited
        # entries and becomes the terminal transmittance.
        accum, cum_all, logt_comp = state
        sl = pl.ds(i * KC, KC)
        xy, con, opac, col = _slab_unpack(attrs_ref[0, sl, :], c)
        alpha, _, _, _ = _chunk_alpha(xy, con, opac, px, py)
        alpha = jnp.where((i * KC + kidx) < count, alpha, 0.0)
        log_t = jnp.log1p(-alpha)  # (KC, P)
        cum = jnp.dot(tri, log_t, preferred_element_type=dtype) + cum_all
        composite = cum > LOG_EPS
        t_before = jnp.exp(cum - log_t - cum_all + logt_comp)
        w = jnp.where(composite, alpha * t_before, 0.0)
        accum = accum + jnp.dot(w.T, col, preferred_element_type=dtype)
        cum_all = cum_all + jnp.sum(log_t, axis=0, keepdims=True)
        logt_comp = logt_comp + jnp.sum(
            jnp.where(composite, log_t, 0.0), axis=0, keepdims=True
        )
        return accum, cum_all, logt_comp

    init = (jnp.zeros((p, c), dtype), jnp.zeros((1, p), dtype),
            jnp.zeros((1, p), dtype))
    accum, _, logt = jax.lax.fori_loop(0, n_chunks, body, init)

    t_final = jnp.exp(logt)  # (1, P)
    out_ref[0] = accum + t_final.T * bg_ref[0][None, :]
    alpha_ref[0] = 1.0 - t_final.T  # (P, 1)
    logt_ref[0] = logt.T


def _bwd_kernel(
    counts_ref,
    attrs_ref, bg_ref,
    g_out_ref, g_alpha_ref, logt_ref,
    gattr_ref,
    *, tw: int, ts: int, c: int,
):
    t = pl.program_id(0)
    count = counts_ref[t]
    p = ts * ts
    dtype = gattr_ref.dtype
    px, py = _pixel_coords(t, tw, ts, dtype)
    tri = _tri(dtype)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (KC, 1), 0)
    n_chunks = pl.cdiv(count, KC)

    g_out = g_out_ref[0]            # (P, C)
    t_final = jnp.exp(logt_ref[0])  # (P, 1)
    bg = bg_ref[0]                  # (C,)
    bg_dot_g = jnp.dot(g_out, bg[:, None], preferred_element_type=dtype)  # (P, 1)
    # d(T_final)-mediated term: T_final feeds out via bg and alpha via -1.
    tail_pix = (t_final * (bg_dot_g - g_alpha_ref[0])).T  # (1, P)

    # Pass 1: total_blend[p] = sum_k w_k <c_k, g_out[p]> (the suffix anchor).
    def blend_body(i, state):
        total, cum_all, logt_comp = state
        sl = pl.ds(i * KC, KC)
        xy, con, opac, col = _slab_unpack(attrs_ref[0, sl, :], c)
        alpha, _, _, _ = _chunk_alpha(xy, con, opac, px, py)
        alpha = jnp.where((i * KC + kidx) < count, alpha, 0.0)
        log_t = jnp.log1p(-alpha)
        cum = jnp.dot(tri, log_t, preferred_element_type=dtype) + cum_all
        composite = cum > LOG_EPS
        w = jnp.where(composite, alpha * jnp.exp(cum - log_t - cum_all + logt_comp), 0.0)
        gc = jnp.dot(col, g_out.T, preferred_element_type=dtype)
        total = total + jnp.sum(w * gc, axis=0, keepdims=True)
        cum_all = cum_all + jnp.sum(log_t, axis=0, keepdims=True)
        logt_comp = logt_comp + jnp.sum(
            jnp.where(composite, log_t, 0.0), axis=0, keepdims=True
        )
        return total, cum_all, logt_comp

    total_blend, _, _ = jax.lax.fori_loop(
        0, n_chunks, blend_body,
        (jnp.zeros((1, p), dtype), jnp.zeros((1, p), dtype),
         jnp.zeros((1, p), dtype)),
    )

    # zero-init gradient output (early-exited / empty tiles keep zeros)
    gattr_ref[0] = jnp.zeros_like(gattr_ref[0])

    # Pass 2: forward walk with running inclusive prefix of w*gc.
    def grad_body(i, state):
        cum_all, logt_comp, pref_carry = state
        sl = pl.ds(i * KC, KC)
        xy, con, opac, col = _slab_unpack(attrs_ref[0, sl, :], c)
        alpha, dx, dy, sigma = _chunk_alpha(xy, con, opac, px, py)
        alpha = jnp.where((i * KC + kidx) < count, alpha, 0.0)

        log_t = jnp.log1p(-alpha)
        cum = jnp.dot(tri, log_t, preferred_element_type=dtype) + cum_all
        composite = cum > LOG_EPS
        t_before = jnp.exp(cum - log_t - cum_all + logt_comp)
        w = jnp.where(composite, alpha * t_before, 0.0)

        gc = jnp.dot(col, g_out.T, preferred_element_type=dtype)  # (KC, P)
        wgc = w * gc
        prefix = jnp.dot(tri, wgc, preferred_element_type=dtype) + pref_carry
        suffix = total_blend - prefix  # sum_{j>k} w_j gc_j

        one_m = jnp.maximum(1.0 - alpha, 1e-6)
        dalpha = t_before * gc - (suffix + tail_pix) / one_m
        dalpha = jnp.where(composite & (w > 0.0), dalpha, 0.0)

        # chain through alpha = min(.999, opac * exp(-sigma))
        raw = opac * jnp.exp(-sigma)
        dalpha = jnp.where(raw < ALPHA_CLAMP, dalpha, 0.0)
        dsigma = -raw * dalpha
        dopac = jnp.exp(-sigma) * dalpha

        a_ = con[:, 0:1]
        b_ = con[:, 1:2]
        c_ = con[:, 2:3]
        # d(dx)/d(x_gauss) = -1: sigma falls as the center approaches px
        gattr_ref[0, sl, 0] = -jnp.sum((a_ * dx + b_ * dy) * dsigma, axis=1)
        gattr_ref[0, sl, 1] = -jnp.sum((b_ * dx + c_ * dy) * dsigma, axis=1)
        gattr_ref[0, sl, 2] = jnp.sum(0.5 * dx * dx * dsigma, axis=1)
        gattr_ref[0, sl, 3] = jnp.sum(dx * dy * dsigma, axis=1)
        gattr_ref[0, sl, 4] = jnp.sum(0.5 * dy * dy * dsigma, axis=1)
        gattr_ref[0, sl, 5] = jnp.sum(dopac, axis=1)
        gattr_ref[0, sl, 6 : 6 + c] = jnp.dot(
            w, g_out, preferred_element_type=dtype
        )

        cum_all = cum_all + jnp.sum(log_t, axis=0, keepdims=True)
        logt_comp = logt_comp + jnp.sum(
            jnp.where(composite, log_t, 0.0), axis=0, keepdims=True
        )
        return cum_all, logt_comp, prefix[KC - 1 : KC, :]

    jax.lax.fori_loop(
        0, n_chunks, grad_body,
        (jnp.zeros((1, p), dtype), jnp.zeros((1, p), dtype),
         jnp.zeros((1, p), dtype)),
    )


def _call_fwd(counts, tables, bg, tw, ts, interpret):
    t, k, a = tables.shape
    c = a - 6
    p = ts * ts
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, k, a), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, p, c), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda i, *_: (i, 0, 0)),
        ],
    )
    out, alpha, logt = pl.pallas_call(
        functools.partial(_fwd_kernel, tw=tw, ts=ts, c=c),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t, p, c), tables.dtype),
            jax.ShapeDtypeStruct((t, p, 1), tables.dtype),
            jax.ShapeDtypeStruct((t, p, 1), tables.dtype),
        ],
        interpret=interpret,
    )(counts, tables, bg)
    return out, alpha[..., 0], logt[..., 0]


def _call_bwd(counts, tables, bg, g_out, g_alpha, logt, tw, ts, interpret):
    t, k, a = tables.shape
    c = a - 6
    p = ts * ts
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, k, a), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, p, c), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, k, a), lambda i, *_: (i, 0, 0)),
        ],
    )
    (gattr,) = pl.pallas_call(
        functools.partial(_bwd_kernel, tw=tw, ts=ts, c=c),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((t, k, a), tables.dtype)],
        interpret=interpret,
    )(counts, tables, bg[None, :] if bg.ndim == 1 else bg,
      g_out, g_alpha[..., None], logt[..., None])
    return gattr


def _pad_k(x, pad):
    if not pad:
        return x
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0)))


def _gather_tables(gidx, xys, conics, opacities, colors):
    """ONE fused row gather of the packed (T, K, A) attribute table.
    Invalid (padded) slots carry zero opacity, so the kernels skip them
    without consulting the index sign."""
    attrs = jnp.concatenate(
        [xys, conics, opacities[:, None], colors], axis=1
    )  # (N, A)
    valid = gidx >= 0
    g = jnp.maximum(gidx, 0)
    tables = jnp.where(valid[..., None], attrs[g], 0.0)
    return tables


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _composite_n(counts_f, gidx, xys, conics, opacities, colors, bg, tw, ts):
    (out, alpha), _ = _composite_n_fwd(
        counts_f, gidx, xys, conics, opacities, colors, bg, tw, ts
    )
    return out, alpha


def _composite_n_fwd(counts_f, gidx, xys, conics, opacities, colors, bg,
                     tw, ts):
    counts = counts_f.astype(jnp.int32)
    tables = _gather_tables(gidx, xys, conics, opacities, colors)
    pad = (-tables.shape[1]) % KC
    tables = _pad_k(tables, pad)
    out, alpha, logt = _call_fwd(
        counts, tables, bg[None, :], tw, ts, interpret=not _on_tpu()
    )
    res = (counts_f, gidx, tables, bg, logt, xys.shape[0])
    return (out, alpha), res


def _composite_n_bwd(tw, ts, res, g):
    counts_f, gidx, tables, bg, logt, n = res
    g_out, g_alpha = g
    gattr = _call_bwd(
        counts_f.astype(jnp.int32), tables, bg, g_out, g_alpha, logt,
        tw, ts, interpret=not _on_tpu(),
    )
    k = gidx.shape[1]
    a = tables.shape[-1]
    gattr = gattr[:, :k, :]  # crop KC padding
    # ONE fused global scatter-add: per-(tile, k) grads -> per-Gaussian.
    flat_g = jnp.maximum(gidx, 0).reshape(-1)
    vals = jnp.where((gidx >= 0).reshape(-1, 1), gattr.reshape(-1, a), 0.0)
    acc = jnp.zeros((n, a), vals.dtype).at[flat_g].add(vals)
    # bg gradient: sum_p T_final g_out — cheap in jnp from logt.
    t_final = jnp.exp(logt)  # (T, P)
    gbg = jnp.einsum("tp,tpc->c", t_final, g_out)
    return (jnp.zeros_like(counts_f),
            np.zeros(gidx.shape, jax.dtypes.float0),
            acc[:, 0:2], acc[:, 2:5], acc[:, 5], acc[:, 6:], gbg)


_composite_n.defvjp(_composite_n_fwd, _composite_n_bwd)


def composite_binned(tile_gidx, tile_count, xys, conics, opacities, colors,
                     bg, tw: int, ts: int) -> Tuple[jax.Array, jax.Array]:
    """Differentiable per-tile compositing straight off the binning lists
    (tile_gidx (T, K) int32, -1 padded; tile_count (T,) int32 — no grads).
    Returns (out (T, P, C), alpha (T, P)). The attribute gather and the
    backward scatter-add both live inside the custom_vjp (see module
    docstring)."""
    counts = jnp.minimum(tile_count, tile_gidx.shape[1])
    return _composite_n(
        counts.astype(jnp.float32), tile_gidx, xys, conics, opacities,
        colors, bg, tw, ts,
    )


def composite_tiles(counts, tile_xy, tile_con, tile_opac, tile_col, bg, tw, ts):
    """Pre-gathered-table compat entry (dev probes): composites fused
    tables built from the four separate per-tile arrays. NOT differentiable
    to the N-level inputs — use `composite_binned` for training."""
    tables = jnp.concatenate(
        [tile_xy, tile_con, tile_opac[..., None], tile_col], axis=-1
    )
    pad = (-tables.shape[1]) % KC
    tables = _pad_k(tables, pad)
    out, alpha, _ = _call_fwd(
        counts.astype(jnp.int32), tables, bg[None, :], tw, ts,
        interpret=not _on_tpu(),
    )
    return out, alpha


# ---------------------------------------------------------------------------
# Pair-stream marshaling (round 3, "v3"): composite straight off the sorted
# pair array. The (T, K) tile_gidx build (a ~25 ms 1.3M-element gather at
# the bench point) and the (T, K, A) table gather/materialization disappear;
# instead ONE row gather produces the depth-sorted pair attribute stream
# pair_attrs[i] = attrs[sorted_gidx[i]], and each tile's kernel instance
# stages its contiguous segment [start_t, start_t + kr) into VMEM with ONE
# DMA (kr = K rounded to a KC multiple; the stream is padded by kr rows).
# Whole-segment staging replaced per-slab start/wait DMAs after the slab
# DMA latency (~2.4 us x K/KC slabs per pass per tile) measured as the
# dominant kernel cost; one ~1 MB transfer per tile is bandwidth-bound.
# The backward is ONE reverse walk (round 4; previously a total_blend
# forward pass + a forward grad pass): prefixes are reconstructed from
# the saved per-pixel totals minus a running suffix. It accumulates
# pair-space gradients in a VMEM window and flushes kr rows with ONE DMA
# at the same offsets (ascending tile order makes window-overrun writes
# safe: the next tile rewrites its own rows later in the sequential grid;
# rows past every window stay at their zero initialization via
# input/output aliasing) and ONE scatter-add by sorted_gidx maps them to
# per-Gaussian gradients. Unaligned dynamic-offset DMA validated by
# scripts_dev/dma_probe.py.
# ---------------------------------------------------------------------------


def _fwd_pairs_kernel(
    starts_ref, counts_ref,  # scalar prefetch (T,), (T,)
    pairs_hbm, bg_ref,
    out_ref, alpha_ref, logt_ref, ncomp_ref,
    scratch, sem,
    *, tw: int, ts: int, c: int, kr: int, mm,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    p = ts * ts
    dtype = out_ref.dtype
    px, py = _pixel_coords(t, tw, ts, dtype)
    if PREFIX_IMPL == "shift":
        pfx = _prefix_incl
    else:
        # mm: matmul-INPUT dtype (f32 or bf16 — RasterizeConfig.
        # kernel_compute); accumulation and every carry stay `dtype`
        tri = _tri(mm)
        pfx = lambda v: jnp.dot(tri, v.astype(mm),
                                preferred_element_type=dtype)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (KC, 1), 0)
    n_chunks = pl.cdiv(count, KC)

    # Stage the WHOLE tile segment with ONE DMA (kr = K rounded up to a
    # KC multiple; the pair array is padded by kr rows so the window
    # always lands in bounds). One ~1 MB transfer per tile amortizes the
    # DMA issue+latency that a per-slab start/wait pays ~K/KC times —
    # measured ~2.4 us/slab on the v5e, i.e. most of the kernel time at
    # the bench point (docs/ROUND_NOTES.md round 3).
    seg = pltpu.make_async_copy(
        pairs_hbm.at[pl.ds(start, kr), :], scratch, sem,
    )

    @pl.when(count > 0)
    def _stage():
        seg.start()
        seg.wait()

    def _front(i):
        """Carry-independent front half of chunk i: attribute unpack,
        alpha, log_t and the prefix MATMUL. Hoisting two of these per
        loop iteration (UNROLL=2) lets their MXU latencies overlap — the
        walk is latency-bound on one dependent prefix matmul per chunk
        (r4 xplane: fwd kernel ~14.8 ms at ~6.7k serialized chunks)."""
        xy, con, opac, col = _slab_unpack(scratch[pl.ds(i * KC, KC), :], c)
        alpha, _, _, _ = _chunk_alpha(xy, con, opac, px, py)
        alpha = jnp.where((i * KC + kidx) < count, alpha, 0.0)
        log_t = jnp.log1p(-alpha)
        return alpha, log_t, pfx(log_t), col

    def _tail(state, front):
        accum, cum_all, logt_comp, ncomp = state
        alpha, log_t, pfv, col = front
        cum = pfv + cum_all
        composite = cum > LOG_EPS
        t_before = jnp.exp(cum - log_t - cum_all + logt_comp)
        w = jnp.where(composite, alpha * t_before, 0.0)
        accum = accum + jnp.dot(w.T.astype(mm), col.astype(mm),
                                preferred_element_type=dtype)
        cum_all = cum_all + jnp.sum(log_t, axis=0, keepdims=True)
        logt_comp = logt_comp + jnp.sum(
            jnp.where(composite, log_t, 0.0), axis=0, keepdims=True
        )
        ncomp = ncomp + jnp.sum(composite.astype(dtype), axis=0,
                                keepdims=True)
        return accum, cum_all, logt_comp, ncomp

    init = (jnp.zeros((p, c), dtype), jnp.zeros((1, p), dtype),
            jnp.zeros((1, p), dtype), jnp.zeros((1, p), dtype))
    if UNROLL == 2:
        def body(i, state):
            f0 = _front(2 * i)
            f1 = _front(2 * i + 1)
            return _tail(_tail(state, f0), f1)

        accum, _, logt, ncomp = jax.lax.fori_loop(
            0, pl.cdiv(count, 2 * KC), body, init)
    else:
        accum, _, logt, ncomp = jax.lax.fori_loop(
            0, n_chunks, lambda i, s: _tail(s, _front(i)), init)

    t_final = jnp.exp(logt)
    out_ref[0] = accum + t_final.T * bg_ref[0][None, :]
    alpha_ref[0] = 1.0 - t_final.T
    logt_ref[0] = logt.T
    # per-pixel CUT INDEX (count of composited entries): the transmittance
    # cut is a prefix property (cum is monotone non-increasing), so the
    # composite mask of entry k is exactly k < ncomp — the backward walks
    # in reverse using only this scalar, no prefix reconstruction needed.
    # Float caveat: prefix outputs are independent dot products whose
    # rounding can differ by ~1 ulp, so the fwd mask could in principle
    # have a 1-entry hole/extra exactly AT the cut where cum ~ LOG_EPS;
    # the backward's k < ncomp mask is prefix-shaped by construction and
    # would then treat that boundary entry differently. The discrepancy
    # is bounded by that entry's weight (~the 1e-4 transmittance cut
    # times |c|), far inside the oracle tolerances, and every backend
    # shares per-entry float cut tests — accepted, not silent.
    ncomp_ref[0] = ncomp.T


def _rtri(dtype):
    """(KC, KC) upper-triangular ones (incl. diagonal): suffix-cumsum-by-
    matmul for the reverse walk — dot(rtri, v)[k] = sum_{j>=k} v[j]."""
    return (
        jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 1)
    ).astype(dtype)


def _bwd_pairs_kernel(
    starts_ref, counts_ref,
    pairs_hbm, bg_ref, g_out_ref, g_alpha_ref, logt_ref, ncomp_ref,
    gpairs_in,
    gpairs_hbm,
    scratch, gscratch, sem, gsem,
    *, tw: int, ts: int, c: int, kr: int, mm,
):
    """ONE reverse walk (back-to-front), the CUDA backward's structure:
    the composite mask comes straight from the saved per-pixel cut index
    (composite[k] == k < ncomp — no prefix reconstruction), and the
    transmittance prefix is the saved composited total minus a running
    suffix, so the old pass-1 `total_blend` forward walk AND the cut-test
    prefix op are gone — 2 walks per tile (1 fwd + 1 bwd) instead of 3,
    and the walk carries 2 in-chunk prefix ops instead of the forward
    formulation's 3. Validity of the subtraction: every entry before a
    composited one is itself composited (the cut is a prefix property),
    so the composited-entry prefix equals the forward's exactly where
    w > 0."""
    del gpairs_in  # aliased zero-initialized output; only written below
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    p = ts * ts
    dtype = g_out_ref.dtype
    px, py = _pixel_coords(t, tw, ts, dtype)
    if PREFIX_IMPL == "shift":
        sfx = _suffix_incl
    else:
        rtri = _rtri(mm)
        sfx = lambda v: jnp.dot(rtri, v.astype(mm),
                                preferred_element_type=dtype)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (KC, 1), 0)
    n_chunks = pl.cdiv(count, KC)

    g_out = g_out_ref[0]
    g_out_mm = g_out.astype(mm)  # matmul-input cast, hoisted out of the walk
    t_final = jnp.exp(logt_ref[0])
    bg = bg_ref[0]
    bg_dot_g = jnp.dot(g_out, bg[:, None], preferred_element_type=dtype)
    tail_pix = (t_final * (bg_dot_g - g_alpha_ref[0])).T
    # per-pixel cut index, carried in int32 so the k < ncomp mask stays
    # exact for any stream dtype (a bf16 float compare loses integer
    # exactness past 256; the fwd kernel accumulates ncomp in the f32
    # walk dtype, so the int cast here is lossless)
    ncomp = ncomp_ref[0].T.astype(jnp.int32)  # (1, P)
    logt_total = logt_ref[0].T    # (1, P) sum of composited log_t

    seg = pltpu.make_async_copy(
        pairs_hbm.at[pl.ds(start, kr), :], scratch, sem,
    )

    @pl.when(count > 0)
    def _stage():
        seg.start()
        seg.wait()

    def fetch(i):
        return _slab_unpack(scratch[pl.ds(i * KC, KC), :], c)

    @pl.when(count > 0)
    def _zero():
        # rows past the walked prefix are stale from the previous tile's
        # segment; the flush writes all kr rows, so they must be zeroed
        # (they may overrun into the next tile's head, which rewrites
        # them later — the grid runs sequentially ascending — or into
        # stream-tail rows, which must stay zero).
        gscratch[:] = jnp.zeros((kr, gscratch.shape[1]), dtype)

    def _rfront(i):
        """Carry-independent front half of reverse-walk chunk i: the
        whole alpha/transcendental chain (the kernel's VPU wall — the r5
        bf16 A/B proved the walk VPU-bound, not MXU-bound) plus the two
        MXU products that don't need the carries — sfx(lcomp) (the
        composite mask comes from the saved cut index, no carry!) and
        the gc matmul. At UNROLL=1 (default) the chain's blocks (alpha,
        dx, dy, exp(-sigma)) pass THROUGH to the tail so nothing is
        computed twice — the pre-r5 tail recomputed the full chain,
        doubling the backward's transcendentals (log1p + 2 exp per
        chunk). UNROLL=2 holds two fronts live, so it keeps the original
        SMALL-front design (chain recomputed in the tail): two full
        fronts of dx/dy/esig/alpha blocks overflowed the 16 MiB scoped
        VMEM when first tried."""
        xy, con, opac, col = fetch(i)
        alpha, dx, dy, sigma = _chunk_alpha(xy, con, opac, px, py)
        alpha = jnp.where((i * KC + kidx) < count, alpha, 0.0)
        log_t = jnp.log1p(-alpha)
        composite = (i * KC + kidx) < ncomp  # int32 vs int32 (dtype-safe)
        lcomp = jnp.where(composite, log_t, 0.0)
        gc = jnp.dot(col.astype(mm), g_out_mm.T,
                     preferred_element_type=dtype)
        if UNROLL == 2:
            return i, lcomp, sfx(lcomp), gc
        esig = jnp.exp(-sigma)
        return i, lcomp, sfx(lcomp), gc, alpha, dx, dy, esig

    def _rtail(state, front):
        suffix_comp, suffix_wgc = state
        if UNROLL == 2:
            i, lcomp, sfx_lcomp, gc = front
            xy, con, opac, col = fetch(i)
            alpha, dx, dy, sigma = _chunk_alpha(xy, con, opac, px, py)
            alpha = jnp.where((i * KC + kidx) < count, alpha, 0.0)
            esig = jnp.exp(-sigma)
        else:
            i, lcomp, sfx_lcomp, gc, alpha, dx, dy, esig = front
            xy, con, opac, col = fetch(i)
        composite = (i * KC + kidx) < ncomp  # int32 vs int32 (dtype-safe)
        sc_incl = sfx_lcomp + suffix_comp
        # prefix of composited log_t STRICTLY before k = total - sc_incl
        t_before = jnp.exp(logt_total - sc_incl)
        w = jnp.where(composite, alpha * t_before, 0.0)
        wgc = w * gc
        suffix = sfx(wgc) - wgc + suffix_wgc  # sum_{j>k} w_j <c_j, g>

        one_m = jnp.maximum(1.0 - alpha, 1e-6)
        dalpha = t_before * gc - (suffix + tail_pix) / one_m
        dalpha = jnp.where(composite & (w > 0.0), dalpha, 0.0)
        raw = opac * esig
        dalpha = jnp.where(raw < ALPHA_CLAMP, dalpha, 0.0)
        dsigma = -raw * dalpha
        dopac = esig * dalpha

        a_ = con[:, 0:1]
        b_ = con[:, 1:2]
        c_ = con[:, 2:3]
        slab = jnp.concatenate(
            [
                -jnp.sum((a_ * dx + b_ * dy) * dsigma, axis=1)[:, None],
                -jnp.sum((b_ * dx + c_ * dy) * dsigma, axis=1)[:, None],
                jnp.sum(0.5 * dx * dx * dsigma, axis=1)[:, None],
                jnp.sum(dx * dy * dsigma, axis=1)[:, None],
                jnp.sum(0.5 * dy * dy * dsigma, axis=1)[:, None],
                jnp.sum(dopac, axis=1)[:, None],
                jnp.dot(w.astype(mm), g_out_mm,
                        preferred_element_type=dtype),
                jnp.zeros((KC, gscratch.shape[1] - 6 - c), dtype),
            ],
            axis=1,
        )
        # beyond-count rows must stay zero
        slab = jnp.where((i * KC + kidx) < count, slab, 0.0)
        gscratch[pl.ds(i * KC, KC), :] = slab

        suffix_comp = suffix_comp + jnp.sum(lcomp, axis=0, keepdims=True)
        suffix_wgc = suffix_wgc + jnp.sum(wgc, axis=0, keepdims=True)
        return suffix_comp, suffix_wgc

    rinit = (jnp.zeros((1, p), dtype), jnp.zeros((1, p), dtype))
    if UNROLL == 2:
        def rgrad_body(ii, state):
            base = (pl.cdiv(count, 2 * KC) - 1 - ii) * 2
            f1 = _rfront(base + 1)  # reverse order: high chunk first
            f0 = _rfront(base)
            return _rtail(_rtail(state, f1), f0)

        jax.lax.fori_loop(0, pl.cdiv(count, 2 * KC), rgrad_body, rinit)
    else:
        jax.lax.fori_loop(
            0, n_chunks,
            lambda ii, s: _rtail(s, _rfront(n_chunks - 1 - ii)), rinit,
        )

    gflush = pltpu.make_async_copy(
        gscratch, gpairs_hbm.at[pl.ds(start, kr), :], gsem,
    )

    @pl.when(count > 0)
    def _flush():
        gflush.start()
        gflush.wait()


def _call_fwd_pairs(starts, counts, pair_attrs, bg, tw, ts, t, c, kr,
                    interpret, mm=jnp.float32):
    a = pair_attrs.shape[-1]  # LANE-padded
    p = ts * ts
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, c), lambda i, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, p, c), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((kr, a), pair_attrs.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )
    out, alpha, logt, ncomp = pl.pallas_call(
        functools.partial(_fwd_pairs_kernel, tw=tw, ts=ts, c=c, kr=kr,
                          mm=mm),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t, p, c), pair_attrs.dtype),
            jax.ShapeDtypeStruct((t, p, 1), pair_attrs.dtype),
            jax.ShapeDtypeStruct((t, p, 1), pair_attrs.dtype),
            jax.ShapeDtypeStruct((t, p, 1), pair_attrs.dtype),
        ],
        interpret=interpret,
    )(starts, counts, pair_attrs, bg)
    return out, alpha[..., 0], logt[..., 0], ncomp[..., 0]


def _call_bwd_pairs(starts, counts, pair_attrs, bg, g_out, g_alpha, logt,
                    ncomp, tw, ts, kr, interpret, mm=jnp.float32):
    t = g_out.shape[0]
    a = pair_attrs.shape[-1]  # LANE-padded
    c = g_out.shape[-1]
    p = ts * ts
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, c), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, p, c), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[pltpu.VMEM((kr, a), pair_attrs.dtype),
                        pltpu.VMEM((kr, a), pair_attrs.dtype),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
    )
    zeros = jnp.zeros(pair_attrs.shape, pair_attrs.dtype)
    (gpairs,) = pl.pallas_call(
        functools.partial(_bwd_pairs_kernel, tw=tw, ts=ts, c=c, kr=kr,
                          mm=mm),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(pair_attrs.shape, pair_attrs.dtype)],
        # the zeros input (flattened input index 8, after the 2 scalar-
        # prefetch args and 6 tensor inputs) IS the gradient buffer:
        # aliasing keeps un-walked rows at zero without a kernel-side sweep
        input_output_aliases={8: 0},
        # REQUIRED sequential grid: each tile's kr-row gradient flush may
        # overrun into the NEXT tile's segment head, which is only safe
        # because that tile rewrites its own rows later in an ascending
        # sequential walk. Pin the grid dimension to 'arbitrary' so a
        # megacore part (v4/v5p parallel grids) can never race the
        # overlapping flushes and corrupt gradients.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # headroom above the conservative 16 MiB scoped default: the
            # unroll-2 walk holds two chunk fronts live (v5e VMEM is
            # 128 MiB; the kernel's own scratch is ~2 MiB)
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=interpret,
    )(starts, counts, pair_attrs, bg[None, :] if bg.ndim == 1 else bg,
      g_out, g_alpha[..., None], logt[..., None], ncomp[..., None], zeros)
    return gpairs


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def _composite_pairs(starts_f, counts_f, pair_gidx, xys, conics, opacities,
                     colors, bg, tw, ts, t, kr, mt, compute):
    (out, alpha), _ = _composite_pairs_fwd(
        starts_f, counts_f, pair_gidx, xys, conics, opacities, colors, bg,
        tw, ts, t, kr, mt, compute,
    )
    return out, alpha


LANE = 128
"""Minor-dim width of the HBM pair arrays: Mosaic requires DMA slices to
be lane-tile (128) aligned along the last dimension, so the (6+C)-column
attribute rows are padded to 128. Row gathers cost per ROW on this TPU
(~12 ns regardless of width, docs/ROUND_NOTES.md), so the pad is free at
the gather and only costs HBM footprint."""


def _gather_pairs(pair_gidx, xys, conics, opacities, colors, kr):
    """ONE row gather of the depth-sorted pair attribute stream, padded by
    kr rows (so the whole-segment staging DMA of any tile stays in
    bounds) and to LANE columns (DMA alignment).

    The optimization barrier pins the pad BEFORE the gather: without it
    XLA rewrites gather(pad(attrs)) -> pad(gather(attrs)), moving the
    column pad from the (N, A) table to the (B, A) stream — a measured
    1.5 ms full-width rewrite of the ~0.5 GB stream per iter (r5
    hlo_stats pad.17) versus a ~free pad of the 200k-row table (row
    gathers cost per row, not per byte, so gathering 128 columns costs
    the same as 45)."""
    attrs = jnp.concatenate(
        [xys, conics, opacities[:, None], colors], axis=1
    )
    a = attrs.shape[-1]
    if a > LANE:
        raise ValueError(f"attribute width {a} exceeds the {LANE}-lane row")
    attrs = jnp.pad(attrs, ((0, 0), (0, LANE - a)))
    attrs = jax.lax.optimization_barrier(attrs)
    gpad = jnp.pad(pair_gidx, (0, kr))
    return attrs[gpad]


def _composite_pairs_fwd(starts_f, counts_f, pair_gidx, xys, conics,
                         opacities, colors, bg, tw, ts, t, kr, mt,
                         compute="f32"):
    starts = starts_f.astype(jnp.int32)
    counts = counts_f.astype(jnp.int32)
    pair_attrs = _gather_pairs(pair_gidx, xys, conics, opacities, colors, kr)
    fwd_call = _call_fwd_pairs2 if TP == 2 else _call_fwd_pairs
    out, alpha, logt, ncomp = fwd_call(
        starts, counts, pair_attrs, bg[None, :], tw, ts, t,
        colors.shape[-1], kr, interpret=not _on_tpu(),
        mm=jnp.bfloat16 if compute == "bf16" else jnp.float32,
    )
    res = (starts_f, counts_f, pair_gidx, pair_attrs, bg, logt, ncomp,
           xys.shape[0])
    return (out, alpha), res


SCATTER_IMPL = _os.environ.get("GGT_SCATTER", "add")
"""Pair-grad -> per-Gaussian reduction:
  'add'  — ONE fused global scatter-add (default; measured 12.2 ms at
           the bench point: random-write accumulates pay ~12.7 ns/row).
  'sort' — sort pair rows by Gaussian, then a static-width gather +
           masked (N, MT, A) sum. MEASURED 3.4x SLOWER end-to-end on the
           v5e (render fwd+bwd 333.8 vs 99.1 ms, r4 probe 2026-08-21):
           the permuted row gather + the two-level (N, MT) gather lower
           to a far worse access pattern than the single scatter. Kept
           for A/B; bit-compatible within f32 summation-order rounding."""


def _segment_reduce_pairs(pair_gidx, gpairs, n, a, mt):
    """'sort' reduction (see SCATTER_IMPL). Garbage indices past the
    valid stream prefix carry ZERO gradient rows (aliased init). The sort
    key is (gaussian, is_zero_row, stream position): all-zero rows —
    garbage duplicates AND un-walked rows inside clipped segments (a
    tile_count > K or B-budget clamp leaves an earlier tile's zero rows
    at stream positions BEFORE a later tile's walked rows) — sort after
    every real gradient row of the same Gaussian, so the first-mt window
    always covers every nonzero row. Dropping zero rows past the window
    is lossless by construction (each Gaussian has at most mt real
    pairs: one per hit tile)."""
    b = pair_gidx.shape[0]
    iota = jnp.arange(b, dtype=jnp.int32)
    is_zero = jnp.all(gpairs[:, :a] == 0.0, axis=1).astype(jnp.int32)
    gidx_sorted, _, perm = jax.lax.sort((pair_gidx, is_zero, iota),
                                        num_keys=2, is_stable=True)
    gsorted = gpairs[perm][:, :a]
    bounds = jnp.searchsorted(
        gidx_sorted, jnp.arange(n + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    counts = jnp.minimum(bounds[1:] - bounds[:-1], mt)
    j = jnp.arange(mt, dtype=jnp.int32)
    pos = jnp.minimum(bounds[:-1, None] + j[None, :], b - 1)
    valid = j[None, :] < counts[:, None]
    return jnp.sum(jnp.where(valid[..., None], gsorted[pos], 0.0), axis=1)


def _composite_pairs_bwd(tw, ts, t, kr, mt, compute, res, g):
    starts_f, counts_f, pair_gidx, pair_attrs, bg, logt, ncomp, n = res
    g_out, g_alpha = g
    bwd_call = _call_bwd_pairs2 if TP == 2 else _call_bwd_pairs
    gpairs = bwd_call(
        starts_f.astype(jnp.int32), counts_f.astype(jnp.int32), pair_attrs,
        bg, g_out, g_alpha, logt, ncomp, tw, ts, kr,
        interpret=not _on_tpu(),
        mm=jnp.bfloat16 if compute == "bf16" else jnp.float32,
    )
    a = 6 + g_out.shape[-1]
    b = pair_gidx.shape[0]
    if SCATTER_IMPL == "sort" and 0 < mt <= 64:
        acc = _segment_reduce_pairs(pair_gidx, gpairs, n, a, mt)
    else:
        # ONE fused scatter-add: pair-space grads -> per-Gaussian grads.
        # Rows past every walked window are exactly zero (aliased init),
        # so garbage indices in the stream tail contribute nothing.
        # The scatter runs FULL LANE width: scatters cost per ROW
        # (~12.7 ns, r4 hlo_stats) so the extra zero columns are ~free
        # (measured identical at 45 vs 128 cols), while slicing columns
        # first materialized a 1.5 ms full-stream copy; the pad columns
        # are zeros (the kernel writes them as such), so the wide
        # accumulator's tail columns stay zero and are cropped at
        # (N, LANE) size — ~200x cheaper. (An index-pad mode='drop'
        # variant that also avoids the ROW slice measured NEUTRAL: it
        # grew the binning sorts by the pad rows and the saved slice
        # came back as sort time; r5 probe, docs/ROUND_NOTES.md.)
        acc = jnp.zeros((n, gpairs.shape[-1]), gpairs.dtype)
        acc = acc.at[pair_gidx].add(gpairs[:b])[:, :a]
    t_final = jnp.exp(logt)
    gbg = jnp.einsum("tp,tpc->c", t_final, g_out)
    return (jnp.zeros_like(starts_f), jnp.zeros_like(counts_f),
            np.zeros(pair_gidx.shape, jax.dtypes.float0),
            acc[:, 0:2], acc[:, 2:5], acc[:, 5], acc[:, 6:], gbg)


_composite_pairs.defvjp(_composite_pairs_fwd, _composite_pairs_bwd)


def composite_pair_stream(pair_gidx, seg_starts, tile_count, xys, conics,
                          opacities, colors, bg, tw: int, ts: int,
                          k_cap: int, mt: int = 0, compute: str = "f32"
                          ) -> Tuple[jax.Array, jax.Array]:
    """Differentiable per-tile compositing straight off the sorted pair
    stream (see the v3 section comment). pair_gidx (B,) int32 is the
    depth-sorted pair payload (Gaussian index per pair; garbage past the
    valid prefix is fine — it is never walked); seg_starts (T,) the first
    stream position of each tile's segment; tile_count (T,) the segment
    length (pre-clamp). Walks min(count, k_cap, B - start) pairs per tile.
    Returns (out (T, P, C), alpha (T, P))."""
    b = pair_gidx.shape[0]
    t = seg_starts.shape[0]
    # staging-window rows: K rounded up to the walk stride (UNROLL chunks
    # of KC — the unrolled loop reads whole strides, so the window and
    # stream pad must cover the final partial stride)
    stride = UNROLL * KC
    kr = -(-k_cap // stride) * stride
    # VMEM guard: the backward allocates TWO (kr, 128) f32 scratch windows
    # (attribute stage + gradient accumulator) = kr * 1 KiB; past ~8k rows
    # they crowd the ~16 MiB VMEM alongside the per-tile blocks and Mosaic
    # fails to compile with an opaque scoped-vmem error. Fail fast with
    # the actionable knob instead (configs that large should lower
    # max_gaussians_per_tile or use backend="xla").
    vmem_bytes = 2 * kr * LANE * 4
    if vmem_bytes > 12 * 1024 * 1024:
        raise ValueError(
            f"composite_pair_stream: k_cap={k_cap} needs {vmem_bytes/2**20:.0f}"
            " MiB of VMEM scratch (2 x kr x 128 f32) and will not fit the"
            " ~16 MiB budget; lower RasterizeConfig.max_gaussians_per_tile"
            " (<= 8192) or use the 'xla' backend for huge per-tile caps."
        )
    starts = jnp.minimum(seg_starts, b)
    counts = jnp.minimum(jnp.minimum(tile_count, k_cap),
                         jnp.maximum(b - starts, 0))
    return _composite_pairs(
        starts.astype(jnp.float32), counts.astype(jnp.float32), pair_gidx,
        xys, conics, opacities, colors, bg, tw, ts, t, kr, mt, compute,
    )


# ---------------------------------------------------------------------------
# Tile-pair kernels (round 5, GGT_TP=2): TWO independent tiles per kernel
# instance, their walks interleaved chunk-by-chunk in one fori_loop. The r5
# A/B campaign (bf16 inputs, KC=256, transcendental dedup — all neutral or
# worse, docs/ROUND_NOTES.md) localized the kernel wall to the SERIAL
# per-chunk dependency chain (~1.1 us per dependent 128-row matmul/VPU
# block); two tiles give the scheduler genuinely independent instruction
# streams to overlap, unlike UNROLL=2 whose second front still fed the same
# tile's carries. Cost: each pair walks to max(count0, count1), wasting
# (max-min) chunk work — adjacent tiles have correlated occupancy, so the
# imbalance is small at the bench point. Results are bit-identical to the
# TP=1 kernels (per-tile masks unchanged; only instruction scheduling
# differs).
# ---------------------------------------------------------------------------

TP = int(_os.environ.get("GGT_TP", "1"))
"""Tiles per pair-stream kernel instance (1 or 2)."""


def _fwd_pairs2_kernel(
    starts_ref, counts_ref,
    pairs_hbm, bg_ref,
    out_ref, alpha_ref, logt_ref, ncomp_ref,
    scratch0, scratch1, sem0, sem1,
    *, tw: int, ts: int, c: int, kr: int, mm,
):
    j = pl.program_id(0)
    p = ts * ts
    dtype = out_ref.dtype
    if PREFIX_IMPL == "shift":
        pfx = _prefix_incl
    else:
        tri = _tri(mm)
        pfx = lambda v: jnp.dot(tri, v.astype(mm),
                                preferred_element_type=dtype)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (KC, 1), 0)

    scr = (scratch0, scratch1)
    starts = (starts_ref[2 * j], starts_ref[2 * j + 1])
    counts = (counts_ref[2 * j], counts_ref[2 * j + 1])
    pxy = tuple(_pixel_coords(2 * j + k, tw, ts, dtype) for k in range(2))

    # start both segment DMAs, then wait both (the copies overlap)
    segs = tuple(
        pltpu.make_async_copy(
            pairs_hbm.at[pl.ds(starts[k], kr), :], scr[k],
            (sem0, sem1)[k],
        )
        for k in range(2)
    )
    for k in range(2):
        @pl.when(counts[k] > 0)
        def _start(seg=segs[k]):
            seg.start()
    for k in range(2):
        @pl.when(counts[k] > 0)
        def _wait(seg=segs[k]):
            seg.wait()

    def front(k, i):
        xy, con, opac, col = _slab_unpack(scr[k][pl.ds(i * KC, KC), :], c)
        px, py = pxy[k]
        alpha, _, _, _ = _chunk_alpha(xy, con, opac, px, py)
        alpha = jnp.where((i * KC + kidx) < counts[k], alpha, 0.0)
        log_t = jnp.log1p(-alpha)
        return alpha, log_t, pfx(log_t), col

    def tail(state, front_v):
        accum, cum_all, logt_comp, ncomp = state
        alpha, log_t, pfv, col = front_v
        cum = pfv + cum_all
        composite = cum > LOG_EPS
        t_before = jnp.exp(cum - log_t - cum_all + logt_comp)
        w = jnp.where(composite, alpha * t_before, 0.0)
        accum = accum + jnp.dot(w.T.astype(mm), col.astype(mm),
                                preferred_element_type=dtype)
        cum_all = cum_all + jnp.sum(log_t, axis=0, keepdims=True)
        logt_comp = logt_comp + jnp.sum(
            jnp.where(composite, log_t, 0.0), axis=0, keepdims=True
        )
        ncomp = ncomp + jnp.sum(composite.astype(dtype), axis=0,
                                keepdims=True)
        return accum, cum_all, logt_comp, ncomp

    def init():
        return (jnp.zeros((p, c), dtype), jnp.zeros((1, p), dtype),
                jnp.zeros((1, p), dtype), jnp.zeros((1, p), dtype))

    # walk both tiles in lockstep; the shorter tile's beyond-count chunks
    # contribute alpha = 0 everywhere (count mask) so its carries freeze
    n_chunks = pl.cdiv(jnp.maximum(counts[0], counts[1]), KC)

    def body(i, st):
        s0, s1 = st
        f0 = front(0, i)
        f1 = front(1, i)
        return tail(s0, f0), tail(s1, f1)

    s0, s1 = jax.lax.fori_loop(0, n_chunks, body, (init(), init()))
    for k, stk in ((0, s0), (1, s1)):
        accum, _, logt, ncomp = stk
        t_final = jnp.exp(logt)
        out_ref[k] = accum + t_final.T * bg_ref[0][None, :]
        alpha_ref[k] = 1.0 - t_final.T
        logt_ref[k] = logt.T
        ncomp_ref[k] = ncomp.T


def _call_fwd_pairs2(starts, counts, pair_attrs, bg, tw, ts, t, c, kr,
                     interpret, mm=jnp.float32):
    a = pair_attrs.shape[-1]
    p = ts * ts
    t2 = -(-t // 2)
    pad = 2 * t2 - t
    starts = jnp.pad(starts, (0, pad))
    counts = jnp.pad(counts, (0, pad))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, c), lambda i, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((2, p, c), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((2, p, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((2, p, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((2, p, 1), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((kr, a), pair_attrs.dtype),
                        pltpu.VMEM((kr, a), pair_attrs.dtype),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
    )
    out, alpha, logt, ncomp = pl.pallas_call(
        functools.partial(_fwd_pairs2_kernel, tw=tw, ts=ts, c=c, kr=kr,
                          mm=mm),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((2 * t2, p, c), pair_attrs.dtype),
            jax.ShapeDtypeStruct((2 * t2, p, 1), pair_attrs.dtype),
            jax.ShapeDtypeStruct((2 * t2, p, 1), pair_attrs.dtype),
            jax.ShapeDtypeStruct((2 * t2, p, 1), pair_attrs.dtype),
        ],
        interpret=interpret,
    )(starts, counts, pair_attrs, bg)
    return (out[:t], alpha[:t, :, 0], logt[:t, :, 0], ncomp[:t, :, 0])


def _bwd_pairs2_kernel(
    starts_ref, counts_ref,
    pairs_hbm, bg_ref, g_out_ref, g_alpha_ref, logt_ref, ncomp_ref,
    gpairs_in,
    gpairs_hbm,
    scratch0, scratch1, gscratch0, gscratch1, sem0, sem1, gsem0, gsem1,
    *, tw: int, ts: int, c: int, kr: int, mm,
):
    """Two-tile reverse walk; see _bwd_pairs_kernel for the single-tile
    algorithm and the flush-overrun safety argument. With TP=2 the
    overrun ordering still holds: within an instance tile 2j is flushed
    BEFORE tile 2j+1 (whose rows it may overrun into), and instance j+1
    rewrites anything tile 2j+1's flush overran — the grid stays pinned
    sequential-ascending."""
    del gpairs_in
    j = pl.program_id(0)
    p = ts * ts
    dtype = g_out_ref.dtype
    if PREFIX_IMPL == "shift":
        sfx = _suffix_incl
    else:
        rtri = _rtri(mm)
        sfx = lambda v: jnp.dot(rtri, v.astype(mm),
                                preferred_element_type=dtype)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (KC, 1), 0)

    scr = (scratch0, scratch1)
    gscr = (gscratch0, gscratch1)
    starts = (starts_ref[2 * j], starts_ref[2 * j + 1])
    counts = (counts_ref[2 * j], counts_ref[2 * j + 1])
    pxy = tuple(_pixel_coords(2 * j + k, tw, ts, dtype) for k in range(2))

    bg = bg_ref[0]
    g_out = (g_out_ref[0], g_out_ref[1])
    g_out_mm = tuple(g.astype(mm) for g in g_out)
    tail_pix = []
    ncomp_t = []
    logt_tot = []
    for k in range(2):
        t_final = jnp.exp(logt_ref[k])
        bg_dot_g = jnp.dot(g_out[k], bg[:, None],
                           preferred_element_type=dtype)
        tail_pix.append((t_final * (bg_dot_g - g_alpha_ref[k])).T)
        ncomp_t.append(ncomp_ref[k].T.astype(jnp.int32))
        logt_tot.append(logt_ref[k].T)

    segs = tuple(
        pltpu.make_async_copy(
            pairs_hbm.at[pl.ds(starts[k], kr), :], scr[k],
            (sem0, sem1)[k],
        )
        for k in range(2)
    )
    for k in range(2):
        @pl.when(counts[k] > 0)
        def _start(seg=segs[k]):
            seg.start()
    for k in range(2):
        @pl.when(counts[k] > 0)
        def _wait(seg=segs[k]):
            seg.wait()

    for k in range(2):
        @pl.when(counts[k] > 0)
        def _zero(k=k):
            gscr[k][:] = jnp.zeros((kr, gscr[k].shape[1]), dtype)

    def rfront(k, i):
        xy, con, opac, col = _slab_unpack(scr[k][pl.ds(i * KC, KC), :], c)
        px, py = pxy[k]
        alpha, dx, dy, sigma = _chunk_alpha(xy, con, opac, px, py)
        alpha = jnp.where((i * KC + kidx) < counts[k], alpha, 0.0)
        log_t = jnp.log1p(-alpha)
        composite = (i * KC + kidx) < ncomp_t[k]
        lcomp = jnp.where(composite, log_t, 0.0)
        gc = jnp.dot(col.astype(mm), g_out_mm[k].T,
                     preferred_element_type=dtype)
        esig = jnp.exp(-sigma)
        return i, lcomp, sfx(lcomp), gc, alpha, dx, dy, esig

    def rtail(k, state, front_v):
        suffix_comp, suffix_wgc = state
        i, lcomp, sfx_lcomp, gc, alpha, dx, dy, esig = front_v
        xy, con, opac, col = _slab_unpack(scr[k][pl.ds(i * KC, KC), :], c)
        composite = (i * KC + kidx) < ncomp_t[k]
        sc_incl = sfx_lcomp + suffix_comp
        t_before = jnp.exp(logt_tot[k] - sc_incl)
        w = jnp.where(composite, alpha * t_before, 0.0)
        wgc = w * gc
        suffix = sfx(wgc) - wgc + suffix_wgc

        one_m = jnp.maximum(1.0 - alpha, 1e-6)
        dalpha = t_before * gc - (suffix + tail_pix[k]) / one_m
        dalpha = jnp.where(composite & (w > 0.0), dalpha, 0.0)
        raw = opac * esig
        dalpha = jnp.where(raw < ALPHA_CLAMP, dalpha, 0.0)
        dsigma = -raw * dalpha
        dopac = esig * dalpha

        a_ = con[:, 0:1]
        b_ = con[:, 1:2]
        c_ = con[:, 2:3]
        slab = jnp.concatenate(
            [
                -jnp.sum((a_ * dx + b_ * dy) * dsigma, axis=1)[:, None],
                -jnp.sum((b_ * dx + c_ * dy) * dsigma, axis=1)[:, None],
                jnp.sum(0.5 * dx * dx * dsigma, axis=1)[:, None],
                jnp.sum(dx * dy * dsigma, axis=1)[:, None],
                jnp.sum(0.5 * dy * dy * dsigma, axis=1)[:, None],
                jnp.sum(dopac, axis=1)[:, None],
                jnp.dot(w.astype(mm), g_out_mm[k],
                        preferred_element_type=dtype),
                jnp.zeros((KC, gscr[k].shape[1] - 6 - c), dtype),
            ],
            axis=1,
        )
        slab = jnp.where((i * KC + kidx) < counts[k], slab, 0.0)
        gscr[k][pl.ds(i * KC, KC), :] = slab

        suffix_comp = suffix_comp + jnp.sum(lcomp, axis=0, keepdims=True)
        suffix_wgc = suffix_wgc + jnp.sum(wgc, axis=0, keepdims=True)
        return suffix_comp, suffix_wgc

    def init():
        return (jnp.zeros((1, p), dtype), jnp.zeros((1, p), dtype))

    n_chunks = pl.cdiv(jnp.maximum(counts[0], counts[1]), KC)

    def body(ii, st):
        s0, s1 = st
        i = n_chunks - 1 - ii
        f0 = rfront(0, i)
        f1 = rfront(1, i)
        return rtail(0, s0, f0), rtail(1, s1, f1)

    jax.lax.fori_loop(0, n_chunks, body, (init(), init()))

    # flush order: tile 2j BEFORE tile 2j+1 (overrun safety, see docstring)
    for k in range(2):
        gflush = pltpu.make_async_copy(
            gscr[k], gpairs_hbm.at[pl.ds(starts[k], kr), :],
            (gsem0, gsem1)[k],
        )

        @pl.when(counts[k] > 0)
        def _flush(gflush=gflush):
            gflush.start()
            gflush.wait()


def _call_bwd_pairs2(starts, counts, pair_attrs, bg, g_out, g_alpha, logt,
                     ncomp, tw, ts, kr, interpret, mm=jnp.float32):
    t = g_out.shape[0]
    a = pair_attrs.shape[-1]
    c = g_out.shape[-1]
    p = ts * ts
    t2 = -(-t // 2)
    pad = 2 * t2 - t
    starts = jnp.pad(starts, (0, pad))
    counts = jnp.pad(counts, (0, pad))
    pad3 = lambda x: jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, c), lambda i, *_: (0, 0)),
            pl.BlockSpec((2, p, c), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((2, p, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((2, p, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((2, p, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[pltpu.VMEM((kr, a), pair_attrs.dtype),
                        pltpu.VMEM((kr, a), pair_attrs.dtype),
                        pltpu.VMEM((kr, a), pair_attrs.dtype),
                        pltpu.VMEM((kr, a), pair_attrs.dtype),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
    )
    zeros = jnp.zeros(pair_attrs.shape, pair_attrs.dtype)
    (gpairs,) = pl.pallas_call(
        functools.partial(_bwd_pairs2_kernel, tw=tw, ts=ts, c=c, kr=kr,
                          mm=mm),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(pair_attrs.shape, pair_attrs.dtype)],
        input_output_aliases={8: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )(starts, counts, pair_attrs, bg[None, :] if bg.ndim == 1 else bg,
      pad3(g_out), pad3(g_alpha[..., None]), pad3(logt[..., None]),
      pad3(ncomp[..., None]), zeros)
    return gpairs
