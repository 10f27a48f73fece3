"""Gated LPIPS metric (pure JAX VGG16 feature distance).

Role of the reference's LPIPS eval metric (models/gaussian_splatting.py:
1032-1042 uses torchmetrics' LearnedPerceptualImagePatchSimilarity). LPIPS
needs pretrained VGG16 weights, which cannot be fetched in a zero-egress
image — so the metric is availability-gated exactly like the reference's
behavior on a machine without the weights cached: `lpips()` returns None
when no weight file is present, and eval simply omits the field.

TPU-native redesign (round 2): the round-1 version depended on
torchvision (absent from this image, so the real branch was dead code);
now the VGG16 feature stack is ~40 lines of jnp convolutions and the
weights load from a plain .npz (keys conv{i}_w (kh, kw, cin, cout) /
conv{i}_b, i = 0..12 in VGG16 order) found at $GGT_VGG16_WEIGHTS or
~/.cache/ggt/vgg16.npz. The compute path is therefore fully testable with
random weights; only the IMAGENET-trained values are gated.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import numpy as np

# VGG16 conv plan: output channels per conv layer, 'M' = 2x2 max pool.
# Feature taps after each pre-pool ReLU block — the layers LPIPS-vgg uses.
_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
         512, 512, 512, "M", 512, 512, 512)
_TAP_AFTER_CONV = (1, 3, 6, 9, 12)  # conv indices whose ReLU output is tapped
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)

_WEIGHTS = None
_UNAVAILABLE = False


def default_weight_path() -> Path:
    return Path(os.environ.get(
        "GGT_VGG16_WEIGHTS",
        Path.home() / ".cache" / "ggt" / "vgg16.npz",
    ))


def _load():
    global _WEIGHTS, _UNAVAILABLE
    if _WEIGHTS is not None or _UNAVAILABLE:
        return _WEIGHTS
    path = default_weight_path()
    try:
        blob = np.load(path)
        n_convs = sum(1 for p in _PLAN if p != "M")
        _WEIGHTS = [
            (np.asarray(blob[f"conv{i}_w"], np.float32),
             np.asarray(blob[f"conv{i}_b"], np.float32))
            for i in range(n_convs)
        ]
    except Exception:
        _UNAVAILABLE = True
    return _WEIGHTS


def reset_cache() -> None:
    """Forget the loaded/missing state (tests point at fresh files)."""
    global _WEIGHTS, _UNAVAILABLE
    _WEIGHTS = None
    _UNAVAILABLE = False


def lpips_available() -> bool:
    return _load() is not None


def random_weights(key=0) -> dict:
    """Random VGG16-shaped weights (for tests / scaffold debugging)."""
    rng = np.random.default_rng(key)
    out = {}
    cin, i = 3, 0
    for p in _PLAN:
        if p == "M":
            continue
        fan = 3 * 3 * cin
        out[f"conv{i}_w"] = rng.normal(
            0.0, (2.0 / fan) ** 0.5, (3, 3, cin, p)
        ).astype(np.float32)
        out[f"conv{i}_b"] = np.zeros(p, np.float32)
        cin, i = p, i + 1
    return out


def _features(x, weights):
    """Run the VGG16 conv stack, returning the LPIPS tap activations."""
    import jax
    import jax.numpy as jnp

    taps = []
    conv_i = 0
    for p in _PLAN:
        if p == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        w, b = weights[conv_i]
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(b)
        x = jnp.maximum(x, 0.0)
        if conv_i in _TAP_AFTER_CONV:
            taps.append(x)
        conv_i += 1
        if conv_i > max(_TAP_AFTER_CONV):
            break
    return taps


def lpips(pred: np.ndarray, gt: np.ndarray) -> Optional[float]:
    """Perceptual distance between two (H, W, 3) images in [0, 1]:
    unit-normalized VGG16 feature differences averaged over the LPIPS tap
    layers (the uncalibrated LPIPS-vgg form — the learned per-channel
    weights would also need a download). None when the weights are
    unavailable."""
    weights = _load()
    if weights is None:
        return None
    import jax.numpy as jnp

    def prep(img):
        x = (np.asarray(img, np.float32) - _MEAN) / _STD
        return jnp.asarray(x)[None]

    taps_a = _features(prep(pred), weights)
    taps_b = _features(prep(gt), weights)
    total = 0.0
    for fa, fb in zip(taps_a, taps_b):
        na = fa / jnp.maximum(jnp.linalg.norm(fa, axis=-1, keepdims=True), 1e-8)
        nb = fb / jnp.maximum(jnp.linalg.norm(fb, axis=-1, keepdims=True), 1e-8)
        total += float(jnp.mean(jnp.sum((na - nb) ** 2, axis=-1)))
    return total / len(taps_a)
