"""Loss functions for language-embedded Gaussian splatting.

Replicates the reference loss set (ref /root/reference/nerfstudio/models/
gaussian_splatting.py:841-933): masked L1 + SSIM on RGB, masked depth L1,
masked normal MSE + cosine, SAM-mask contrastive feature loss, CLIP
distillation ("up") loss, and the SH / scale-ratio regularizers. All jnp,
all jit-safe (fixed-size sampled index sets come from the data layer).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def safe_norm(x: jax.Array, axis: int = -1, eps: float = 1e-12, keepdims: bool = True):
    """L2 norm with a finite gradient at x == 0 (jnp.linalg.norm's gradient
    is NaN there, and exactly-zero vectors are routine here: empty-pixel
    renders, zero-initialized SH rest bands)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


# ---------------------------------------------------------------------------
# SSIM (matches pytorch_msssim.SSIM(data_range=1, win_size=11, sigma=1.5),
# the metric the reference trains against — gaussian window, valid padding).
# ---------------------------------------------------------------------------

def _gaussian_kernel1d(size: int = 11, sigma: float = 1.5) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / g.sum()


def _band_matrix(n: int, kernel: jax.Array) -> jax.Array:
    """(n, n-k+1) banded matrix B with B[i, o] = kernel[i - o]: x @ B is a
    valid-padding 1-D correlation along that axis."""
    k = kernel.shape[0]
    out = n - k + 1
    i = jax.lax.broadcasted_iota(jnp.int32, (n, out), 0)
    o = jax.lax.broadcasted_iota(jnp.int32, (n, out), 1)
    d = i - o
    return jnp.where((d >= 0) & (d < k), kernel[jnp.clip(d, 0, k - 1)], 0.0)


def _blur_valid(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Separable gaussian blur with valid padding. img: (H, W, C).

    TPU-first formulation: each 1-D pass is a banded MATMUL (Bh.T @ img @
    Bw) instead of a C=1 depthwise conv — an 11-tap conv with one channel
    starves the MXU (measured ~24 ms fwd+bwd at 800x800 inside the train
    step, r4 probe) while the equivalent (H, H-10) matmul is a ~3 GFLOP
    MXU-shaped product. The matmuls stay pinned to HIGHEST precision:
    SSIM estimates variances as blur(img^2) - mu^2, a catastrophic
    cancellation under the TPU's default bf16 passes (sigma^2 ~ 1e-4 vs
    bf16 error ~ 1e-3 on mu^2 ~ 0.25) — measured as a monotone PSNR
    DECLINE at the 800x800 bench point that vanishes at f32
    (docs/ROUND_NOTES.md round 3)."""
    h, w = img.shape[0], img.shape[1]
    bh = _band_matrix(h, kernel)
    bw = _band_matrix(w, kernel)
    hp = jax.lax.Precision.HIGHEST
    x = jnp.moveaxis(img, -1, 0)  # (C, H, W)
    x = jnp.einsum("chw,hm->cmw", x, bh, precision=hp)
    x = jnp.einsum("cmw,wn->cmn", x, bw, precision=hp)
    return jnp.moveaxis(x, 0, -1)  # (H', W', C)


def ssim(
    img0: jax.Array,
    img1: jax.Array,
    *,
    data_range: float = 1.0,
    win_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Mean SSIM between two (H, W, C) images."""
    kernel = _gaussian_kernel1d(win_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu0 = _blur_valid(img0, kernel)
    mu1 = _blur_valid(img1, kernel)
    mu00 = mu0 * mu0
    mu11 = mu1 * mu1
    mu01 = mu0 * mu1
    s00 = _blur_valid(img0 * img0, kernel) - mu00
    s11 = _blur_valid(img1 * img1, kernel) - mu11
    s01 = _blur_valid(img0 * img1, kernel) - mu01

    cs = (2.0 * s01 + c2) / (s00 + s11 + c2)
    ssim_map = ((2.0 * mu01 + c1) / (mu00 + mu11 + c1)) * cs
    return jnp.mean(ssim_map)


# ---------------------------------------------------------------------------
# Pixel losses
# ---------------------------------------------------------------------------

def masked_l1(pred: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean |pred - gt| over mask-true pixels. mask: (H, W) bool; pred/gt
    may have trailing channel dims."""
    m = mask.astype(pred.dtype)
    while m.ndim < pred.ndim:
        m = m[..., None]
    # denominator counts selected *elements*, matching torch's masked mean
    n_el = jnp.maximum(jnp.sum(m) * (pred.shape[-1] if m.shape[-1] == 1 else 1), 1.0)
    return jnp.sum(jnp.abs(pred - gt) * m) / n_el


def masked_mse(pred: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(pred.dtype)
    while m.ndim < pred.ndim:
        m = m[..., None]
    n_el = jnp.maximum(jnp.sum(m) * (pred.shape[-1] if m.shape[-1] == 1 else 1), 1.0)
    return jnp.sum((pred - gt) ** 2 * m) / n_el


def cosine_similarity_loss(
    a: jax.Array, b: jax.Array, weights: Optional[jax.Array] = None
) -> jax.Array:
    """1 - mean cosine similarity along the LAST axis (the reference
    normalizes dim=0 of (C, M) tensors, i.e. the channel axis; here inputs
    are (M, C)). Optional per-row weights for masked means."""
    an = a / safe_norm(a)
    bn = b / safe_norm(b)
    sim = jnp.sum(an * bn, axis=-1)
    if weights is None:
        return 1.0 - jnp.mean(sim)
    w = weights.astype(sim.dtype)
    return 1.0 - jnp.sum(sim * w) / jnp.maximum(jnp.sum(w), 1.0)


def normal_loss(
    pred: jax.Array, gt: jax.Array, mask: jax.Array
) -> jax.Array:
    """0.5 * masked MSE + 0.5 * masked cosine loss (ref :879)."""
    mse = masked_mse(pred, gt, mask)
    cos = cosine_similarity_loss(
        pred.reshape(-1, 3), gt.reshape(-1, 3), weights=mask.reshape(-1)
    )
    return 0.5 * mse + 0.5 * cos


# ---------------------------------------------------------------------------
# Feature losses (contrastive + distillation), over fixed-size index sets
# ---------------------------------------------------------------------------

def contrastive_pairs_loss(
    fa: jax.Array,            # (G, P, F) features at pair_a pixels
    fb: jax.Array,            # (G, P, F) features at pair_b pixels
    pair_valid: jax.Array,    # (G, P) bool
    group_valid: jax.Array,   # (G,) bool
) -> jax.Array:
    """Contrastive loss on PRE-GATHERED pair features (the caller fuses
    the pixel gathers — see model.train_loss: one gather's backward
    scatter materializes a full (H*W, F) buffer, so three separate
    gathers cost three of them)."""
    an = fa / safe_norm(fa)
    bn = fb / safe_norm(fb)
    sim = jnp.sum(an * bn, axis=-1)  # (G, P)
    pv = pair_valid.astype(sim.dtype)
    per_group = 1.0 - jnp.sum(sim * pv, axis=-1) / jnp.maximum(pv.sum(-1), 1.0)
    gv = group_valid.astype(sim.dtype)
    return jnp.sum(per_group * gv) / jnp.maximum(gv.sum(), 1.0)


def contrastive_feature_loss(
    feature_map: jax.Array,   # (H, W, F) rendered latent features
    pair_a: jax.Array,        # (G, P, 2) int pixel coords (row, col) per mask group
    pair_b: jax.Array,        # (G, P, 2)
    pair_valid: jax.Array,    # (G, P) bool
    group_valid: jax.Array,   # (G,) bool
) -> jax.Array:
    """Pull features of same-SAM-mask pixel pairs together (ref :907-916):
    per mask id, 1 - mean cos(f1, f2); averaged over mask ids present."""
    fa = feature_map[pair_a[..., 0], pair_a[..., 1]]  # (G, P, F)
    fb = feature_map[pair_b[..., 0], pair_b[..., 1]]
    return contrastive_pairs_loss(fa, fb, pair_valid, group_valid)


def distillation_loss(
    lifted: jax.Array,       # (S, 512) fea_up(feature at sampled pixels)
    gt_clip: jax.Array,      # (S, 512) ground-truth CLIP at those pixels
    valid: jax.Array,        # (S,) bool
) -> jax.Array:
    """CLIP-space cosine distillation ("up_loss", ref :917-918)."""
    return cosine_similarity_loss(lifted, gt_clip, weights=valid)


# ---------------------------------------------------------------------------
# Regularizers (applied every 10 steps, ref :920-929)
# ---------------------------------------------------------------------------

def sh_reg(sh_coeffs: jax.Array, alive: jax.Array) -> jax.Array:
    """Mean L2 norm of the rest-band SH coefficients over alive gaussians.
    (ref :923: colors_all[:, 1:, :].norm(dim=1).mean())"""
    norms = safe_norm(sh_coeffs[:, 1:, :], axis=1, keepdims=False)  # (C, 3)
    a = alive.astype(norms.dtype)[:, None]
    return jnp.sum(norms * a) / jnp.maximum(a.sum() * 3.0, 1.0)


def scale_reg(
    log_scales: jax.Array, alive: jax.Array, max_gauss_ratio: float = 10.0
) -> jax.Array:
    """PhysGaussian anisotropy regularizer (ref :924-926)."""
    s = jnp.exp(log_scales)
    ratio = jnp.max(s, axis=-1) / jnp.maximum(jnp.min(s, axis=-1), 1e-12)
    penalty = jnp.maximum(ratio, max_gauss_ratio) - max_gauss_ratio
    a = alive.astype(penalty.dtype)
    return 0.1 * jnp.sum(penalty * a) / jnp.maximum(a.sum(), 1.0)


def psnr(pred: jax.Array, gt: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    if mask is None:
        mse = jnp.mean((pred - gt) ** 2)
    else:
        mse = masked_mse(pred, gt, mask)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
