"""Work-proportional XLA compositing: dynamic early-exit + hand-written VJP.

The original XLA path (ops/rasterize.py:_composite_chunk) walks the FULL
per-tile capacity K forward and lets autodiff re-walk it backward — every
tile pays compute AND HBM traffic for K Gaussians even when the
transmittance cut kills the pixel after a few dozen. The reference's CUDA
kernel (gsplat RasterizeGaussians, call sites /root/reference/nerfstudio/
models/gaussian_splatting.py:735-784) is work-proportional: each tile's
forward loop `break`s at the cut and its backward walks back-to-front
from the cut point.

This module gives the XLA backend the same properties without Pallas
(which this image's tunneled TPU cannot Mosaic-compile, see
RasterizeConfig):

  - tiles are processed in chunks (lax.map). Per chunk, a lax.while_loop
    walks K-slabs of KC Gaussians and exits as soon as EITHER every pixel
    in the chunk has crossed the 1e-4 transmittance cut OR the slab start
    passes the chunk's max occupancy.
  - per-Gaussian attributes are gathered from the N-sized arrays INSIDE
    the walk (via the binning index lists), so untouched slabs cost no
    HBM traffic either.
  - all slab tensors live in a K-MAJOR (KC, TC, P) layout so that every
    cumulative sum along K is ONE (KC, KC) @ (KC, TC*P) matmul on the
    MXU. The round-1 layout expressed these as per-tile batched
    (KC, KC) @ (KC, P=256) matmuls, which the TPU ran at ~1.5 TFLOP/s;
    the flat form feeds the systolic array a contiguous N = TC*256 lane
    dimension instead.
  - the backward is ONE reverse walk per chunk (the CUDA design): it
    starts at the forward's saved stopping slab and reconstructs
    transmittances from the saved terminal state by reverse cumulative
    sums, accumulating the suffix blend on the fly — no second forward
    "blend" pass. Per-slab gradients land in per-chunk tables
    (dynamic_update_slice, leading-axis in the k-major layout);
    ONE fused global scatter-add at the end maps them to per-Gaussian
    gradients (TPU scatters want one big op, not read-modify-writes of
    N-sized accumulators inside the loop).
  - lax.while_loop has no reverse-mode rule, so the whole compositing is
    a jax.custom_vjp. The gradient identities match the Pallas kernels
    (ops/rasterize_pallas.py), which are verified against autodiff in
    tests/test_pallas.py; this path is verified against the jnp oracle in
    tests/test_rasterize.py (images AND gradients).

Compositing semantics are bit-identical to the scan path (same alpha
clamp/cutoff, same monotone two-carry transmittance cut).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

ALPHA_CLAMP = 0.999
ALPHA_CUTOFF = 1.0 / 255.0
LOG_EPS = -9.2103403719761836  # log(1e-4)

KC = int(os.environ.get("GGT_KC", "128"))
"""Gaussians walked per while-loop step. Larger slabs feed the MXU a
bigger contraction (the tri-matmul is (KC, KC) @ (KC, TC*P)) at the cost
of coarser early-exit granularity; env-overridable for perf sweeps."""


def _pixel_coords(tile_ids, tw: int, ts: int, dtype):
    """(TC, P) pixel-center x and y for a chunk of tile ids."""
    p = ts * ts
    lin = jnp.arange(p, dtype=jnp.int32)
    px = ((tile_ids % tw) * ts)[:, None] + (lin % ts)[None, :]
    py = ((tile_ids // tw) * ts)[:, None] + (lin // ts)[None, :]
    return px.astype(dtype), py.astype(dtype)


def _slab_alpha(xy, con, opac, px, py):
    """alpha (KC, TC, P) with the CUDA validity predicate; returns
    (alpha, dx, dy, sigma, raw) for reuse in backward. Inputs are k-major:
    xy (KC, TC, 2), con (KC, TC, 3), opac (KC, TC); px/py (TC, P)."""
    dx = px[None, :, :] - xy[:, :, 0:1]  # (KC, TC, P)
    dy = py[None, :, :] - xy[:, :, 1:2]
    a_ = con[:, :, 0:1]
    b_ = con[:, :, 1:2]
    c_ = con[:, :, 2:3]
    sigma = 0.5 * (a_ * dx * dx + c_ * dy * dy) + b_ * dx * dy
    raw = opac[:, :, None] * jnp.exp(-sigma)
    alpha = jnp.minimum(ALPHA_CLAMP, raw)
    ok = (sigma >= 0.0) & (alpha >= ALPHA_CUTOFF)
    return jnp.where(ok, alpha, 0.0), dx, dy, sigma, raw


def _pack_attrs(xys, conics, opacities, colors):
    """One (N, 6+C) attribute table: xy(2) conic(3) opac(1) color(C).
    TPU gathers carry a large fixed cost per gather op (measured ~250 us
    of the ~330 us round-2 slab iteration was the FOUR per-slab gathers),
    so the walk gathers one fused table instead. The layout matches the
    backward's fused scatter-add accumulator."""
    return jnp.concatenate(
        [xys, conics, opacities[:, None], colors], axis=1
    )


def _gather_slab(gidx, s, attrs):
    """Gather one KC-slab of fused per-Gaussian attributes in k-major
    layout (in-loop gather: only touched slabs generate HBM traffic)."""
    gi = jax.lax.dynamic_slice_in_dim(gidx, s * KC, KC, axis=1)  # (TC, KC)
    gi = gi.T  # (KC, TC)
    valid = gi >= 0
    g = jnp.maximum(gi, 0)
    a = attrs[g]  # (KC, TC, 6+C)
    xy = a[..., 0:2]
    con = a[..., 2:5]
    opac = jnp.where(valid, a[..., 5], 0.0)
    col = a[..., 6:]
    return g, valid, xy, con, opac, col


def _tri(dtype):
    """(KC, KC) lower-triangular ones (incl. diagonal). Cumulative sums
    along the K axis run as one flat matmul on the MXU instead of a
    sublane scan — the same trick as the Pallas kernels
    (ops/rasterize_pallas.py:_tri)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 1)
    return (i >= j).astype(dtype)


def _mat_k(tri, x):
    """Apply an (KC, KC) matrix along axis 0 of a k-major (KC, TC, P)
    tensor as ONE flat (KC, KC) @ (KC, TC*P) MXU matmul."""
    kc, tc, p = x.shape
    out = jax.lax.dot(
        tri, x.reshape(kc, tc * p), preferred_element_type=x.dtype
    )
    return out.reshape(kc, tc, p)


def _cumsum_k(tri, x):
    """Inclusive cumsum along axis 0 (K): out[k] = sum_{j<=k} x[j]."""
    return _mat_k(tri, x)


def _chunk_fwd(tile_ids, counts, gidx, attrs, bg,
               tw: int, ts: int):
    """Forward-composite one chunk with early exit.
    Returns (out (TC,P,C), alpha, logt, cum_all, s_stop)."""
    dtype = attrs.dtype
    C = attrs.shape[-1] - 6
    TC, K = gidx.shape
    n_slabs = K // KC
    P = ts * ts
    px, py = _pixel_coords(tile_ids, tw, ts, dtype)
    max_count = jnp.max(counts)
    tri = _tri(dtype)

    def cond(state):
        s, accum, cum_all, logt_comp = state
        alive = jnp.any(cum_all > LOG_EPS)
        return (s < n_slabs) & (s * KC < max_count) & alive

    def body(state):
        s, accum, cum_all, logt_comp = state
        _, _, xy, con, opac, col = _gather_slab(gidx, s, attrs)
        alpha, *_ = _slab_alpha(xy, con, opac, px, py)
        log_t = jnp.log1p(-alpha)  # (KC, TC, P)
        cum = _cumsum_k(tri, log_t) + cum_all[None, :, :]
        composite = cum > LOG_EPS
        t_before = jnp.exp(cum - log_t - cum_all[None, :, :]
                           + logt_comp[None, :, :])
        w = jnp.where(composite, alpha * t_before, 0.0)
        accum = accum + jnp.einsum(
            "ktp,ktc->tpc", w, col, preferred_element_type=jnp.float32
        )
        cum_all = cum_all + jnp.sum(log_t, axis=0)
        logt_comp = logt_comp + jnp.sum(jnp.where(composite, log_t, 0.0), axis=0)
        return (s + 1, accum, cum_all, logt_comp)

    init = (jnp.zeros((), jnp.int32), jnp.zeros((TC, P, C), dtype),
            jnp.zeros((TC, P), dtype), jnp.zeros((TC, P), dtype))
    s_stop, accum, cum_all, logt = jax.lax.while_loop(cond, body, init)
    t_final = jnp.exp(logt)
    out = accum + t_final[..., None] * bg[None, None, :]
    return out, 1.0 - t_final, logt, cum_all, s_stop


def _chunk_bwd(tile_ids, gidx, attrs, bg,
               g_out, g_alpha, logt, cum_all_total, s_stop,
               tw: int, ts: int):
    """ONE reverse walk per chunk (the CUDA backward): from the forward's
    stopping slab back to 0, reconstructing per-entry transmittance from
    the saved terminal state and accumulating the suffix blend on the fly.

    Gradient identities (out = sum_k w_k c_k + T_final*bg, w_k = alpha_k *
    prod_{j<k composited}(1-alpha_j), cut folded into the composite mask):
      dL/dc_k      = sum_p w_kp g_out[p]
      dL/dalpha_kp = T_before*<c_k, g> - suffix_k/(1-alpha)
                     - (<bg, g> - g_alpha_p) * T_final/(1-alpha)
    then the EWA chain to (xy, conic, opacity) as in the Pallas kernels.
    """
    dtype = attrs.dtype
    TC, K = gidx.shape
    A = attrs.shape[-1]
    P = ts * ts
    px, py = _pixel_coords(tile_ids, tw, ts, dtype)

    t_final = jnp.exp(logt)  # (TC, P)
    bg_dot_g = jnp.einsum("tpc,c->tp", g_out, bg)
    tail_pix = t_final * (bg_dot_g - g_alpha)  # (TC, P)
    tri = _tri(dtype)
    rev = tri.T  # out[k] = sum_{j>=k} x[j]

    # ONE fused gradient table in the attrs layout (k-major so per-slab
    # writes are leading-axis dynamic_update_slices): columns are
    # dxy(2) dconic(3) dopac(1) dcolor(C), matching _pack_attrs.
    gattr0 = jnp.zeros((K, TC, A), dtype)

    def cond(state):
        s, *_ = state
        return s >= 0

    def body(state):
        s, suffix, logt_after, cum_after, gattr = state
        _, valid, xy, con, opac, col = _gather_slab(gidx, s, attrs)
        alpha, dx, dy, sigma, raw = _slab_alpha(xy, con, opac, px, py)
        log_t = jnp.log1p(-alpha)

        # inclusive prefix of ALL entries up to k  =  total - strictly-after
        rev_incl = _mat_k(rev, log_t)  # sum_{j>=k in slab}
        after_k = cum_after[None, :, :] + rev_incl - log_t
        cum_incl_k = cum_all_total[None, :, :] - after_k
        composite = cum_incl_k > LOG_EPS

        # composited-only prefix (exclusive) = total_comp - comp-after - own
        log_t_c = jnp.where(composite, log_t, 0.0)
        rev_incl_c = _mat_k(rev, log_t_c)
        comp_after_k = logt_after[None, :, :] + rev_incl_c - log_t_c
        t_before = jnp.exp(logt[None, :, :] - comp_after_k - log_t_c)
        w = jnp.where(composite, alpha * t_before, 0.0)

        gc = jnp.einsum(
            "ktc,tpc->ktp", col, g_out, preferred_element_type=jnp.float32
        )
        wgc = w * gc
        # suffix_k = sum_{j>k} w_j gc_j (later slabs carried in `suffix`)
        rev_incl_wgc = _mat_k(rev, wgc)
        suffix_k = suffix[None, :, :] + rev_incl_wgc - wgc

        one_m = jnp.maximum(1.0 - alpha, 1e-6)
        dalpha = t_before * gc - (suffix_k + tail_pix[None, :, :]) / one_m
        dalpha = jnp.where(composite & (w > 0.0), dalpha, 0.0)
        dalpha = jnp.where(raw < ALPHA_CLAMP, dalpha, 0.0)
        dsigma = -raw * dalpha
        dopac_k = jnp.sum(jnp.exp(-sigma) * dalpha, axis=-1)  # (KC, TC)

        a_ = con[:, :, 0:1]
        b_ = con[:, :, 1:2]
        c_ = con[:, :, 2:3]
        gx = -jnp.sum((a_ * dx + b_ * dy) * dsigma, axis=-1)
        gy = -jnp.sum((b_ * dx + c_ * dy) * dsigma, axis=-1)
        ga = jnp.sum(0.5 * dx * dx * dsigma, axis=-1)
        gb = jnp.sum(dx * dy * dsigma, axis=-1)
        gc2 = jnp.sum(0.5 * dy * dy * dsigma, axis=-1)
        gcol_k = jnp.einsum(
            "ktp,tpc->ktc", w, g_out, preferred_element_type=jnp.float32
        )

        slab_grad = jnp.concatenate(
            [jnp.stack([gx, gy], axis=-1),
             jnp.stack([ga, gb, gc2], axis=-1),
             dopac_k[..., None], gcol_k], axis=-1,
        )
        slab_grad = jnp.where(valid[..., None], slab_grad, 0.0)
        gattr = jax.lax.dynamic_update_slice_in_dim(
            gattr, slab_grad, s * KC, axis=0
        )

        suffix = suffix + jnp.sum(wgc, axis=0)
        logt_after = logt_after + jnp.sum(log_t_c, axis=0)
        cum_after = cum_after + jnp.sum(log_t, axis=0)
        return (s - 1, suffix, logt_after, cum_after, gattr)

    z = jnp.zeros_like(tail_pix)
    init = (s_stop - 1, z, z, z, gattr0)
    state = jax.lax.while_loop(cond, body, init)
    gattr = state[-1]
    gbg = jnp.einsum("tp,tpc->c", t_final, g_out)
    # back to (TC, K, A) for the global scatter
    return jnp.swapaxes(gattr, 0, 1), gbg


def _pad_t(counts, gidx, tile_chunk):
    pad_t = (-gidx.shape[0]) % tile_chunk
    if pad_t:
        counts = jnp.pad(counts, (0, pad_t))
        gidx = jnp.pad(gidx, ((0, pad_t), (0, 0)), constant_values=-1)
    pad_k = (-gidx.shape[1]) % KC
    if pad_k:
        gidx = jnp.pad(gidx, ((0, 0), (0, pad_k)), constant_values=-1)
    return counts, gidx


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _composite(counts_f, tids, gidx, xys, conics, opacities, colors, bg,
               tw, ts, tile_chunk):
    (out, alpha), _ = _composite_fwd(
        counts_f, tids, gidx, xys, conics, opacities, colors, bg, tw, ts,
        tile_chunk,
    )
    return out, alpha


def _pad_ids(tids, tile_chunk):
    pad_t = (-tids.shape[0]) % tile_chunk
    return jnp.pad(tids, (0, pad_t)) if pad_t else tids


def _composite_fwd(counts_f, tids, gidx, xys, conics, opacities, colors, bg,
                   tw, ts, tile_chunk):
    t = gidx.shape[0]
    counts, gidx_p = _pad_t(counts_f.astype(jnp.int32), gidx, tile_chunk)
    t_pad = gidx_p.shape[0]
    n_chunks = t_pad // tile_chunk
    chunked = lambda x: x.reshape((n_chunks, tile_chunk) + x.shape[1:])
    tile_ids = chunked(_pad_ids(tids, tile_chunk))

    attrs = _pack_attrs(xys, conics, opacities, colors)

    def fn(args):
        ids, cnt, gi = args
        return _chunk_fwd(ids, cnt, gi, attrs, bg, tw, ts)

    out, alpha, logt, cum_all, s_stop = jax.lax.map(
        fn, (tile_ids, chunked(counts), chunked(gidx_p)),
    )
    p, c = out.shape[-2:]
    res = (counts_f, tids, gidx, xys, conics, opacities, colors, bg,
           logt, cum_all, s_stop)
    return (out.reshape(t_pad, p, c)[:t], alpha.reshape(t_pad, p)[:t]), res


def _composite_bwd(tw, ts, tile_chunk, res, g):
    (counts_f, tids, gidx, xys, conics, opacities, colors, bg,
     logt, cum_all, s_stop) = res
    g_out, g_alpha = g
    t = gidx.shape[0]
    _, gidx_p = _pad_t(counts_f.astype(jnp.int32), gidx, tile_chunk)
    t_pad = gidx_p.shape[0]
    n_chunks = t_pad // tile_chunk
    chunked = lambda x: x.reshape((n_chunks, tile_chunk) + x.shape[1:])
    tile_ids = chunked(_pad_ids(tids, tile_chunk))
    pad_p = lambda x: jnp.pad(x, [(0, t_pad - t)] + [(0, 0)] * (x.ndim - 1))

    attrs = _pack_attrs(xys, conics, opacities, colors)

    def fn(args):
        ids, gi, go, ga, lt, ca, ss = args
        return _chunk_bwd(ids, gi, attrs, bg, go, ga, lt, ca, ss, tw, ts)

    gattr, gbg = jax.lax.map(
        fn, (tile_ids, chunked(gidx_p), chunked(pad_p(g_out)),
             chunked(pad_p(g_alpha)), logt, cum_all, s_stop),
    )
    # ONE fused scatter: per-(tile, k) grads -> per-Gaussian grads (the
    # gradient table already uses the attrs column layout, so no concat).
    flat_g = jnp.maximum(gidx_p, 0).reshape(-1)
    c = colors.shape[-1]
    vals = gattr.reshape(-1, 6 + c)
    acc = jnp.zeros((xys.shape[0], 6 + c), vals.dtype).at[flat_g].add(vals)
    return (jnp.zeros_like(counts_f),
            np.zeros(tids.shape, jax.dtypes.float0),
            np.zeros(gidx.shape, jax.dtypes.float0),
            acc[:, 0:2], acc[:, 2:5], acc[:, 5], acc[:, 6:], gbg.sum(0))


_composite.defvjp(_composite_fwd, _composite_bwd)


def composite_binned_xla(tile_gidx, tile_count, xys, conics, opacities,
                         colors, bg, tw: int, ts: int, tile_chunk: int = 8,
                         sort_by_count: bool = True
                         ) -> Tuple[jax.Array, jax.Array]:
    """Differentiable per-tile compositing straight off the binning lists
    (tile_gidx (T, K) int32, -1 padded; tile_count (T,) int32 — no grads).
    Returns (out (T, P, C), alpha (T, P)).

    sort_by_count assigns occupancy-sorted tiles to chunks so every chunk's
    early-exiting walk is bounded by tiles of similar depth (a chunk walks
    to its SLOWEST tile — heterogeneous chunks waste the fast tiles'
    exits). Outputs are un-permuted; values are identical either way."""
    counts = jnp.minimum(tile_count, tile_gidx.shape[1])
    t = tile_gidx.shape[0]
    if not sort_by_count:
        tids = jnp.arange(t, dtype=jnp.int32)
        return _composite(
            counts.astype(jnp.float32), tids, tile_gidx, xys, conics,
            opacities, colors, bg, tw, ts, tile_chunk,
        )
    order = jnp.argsort(-counts).astype(jnp.int32)
    inv = jnp.argsort(order).astype(jnp.int32)
    out_s, alpha_s = _composite(
        counts[order].astype(jnp.float32), order, tile_gidx[order], xys,
        conics, opacities, colors, bg, tw, ts, tile_chunk,
    )
    return out_s[inv], alpha_s[inv]
