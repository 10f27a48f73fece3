"""Gated LPIPS metric.

Role of the reference's LPIPS eval metric (models/gaussian_splatting.py:
1032-1042 uses torchmetrics' LearnedPerceptualImagePatchSimilarity). LPIPS
requires pretrained VGG/AlexNet weights, which cannot be fetched in a
zero-egress image — so the metric is availability-gated exactly like the
reference's behavior on a machine without the weights cached: `lpips()`
returns None when torchvision or its weights are missing, and eval simply
omits the field.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_NET = None
_UNAVAILABLE = False

# VGG16 feature-block boundaries (after each pre-pool ReLU) — the layer
# taps LPIPS-vgg uses.
_TAPS = (3, 8, 15, 22, 29)
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _load():
    global _NET, _UNAVAILABLE
    if _NET is not None or _UNAVAILABLE:
        return _NET
    try:
        import torch
        import torchvision

        net = torchvision.models.vgg16(
            weights=torchvision.models.VGG16_Weights.IMAGENET1K_V1
        ).features.eval()
        for p in net.parameters():
            p.requires_grad_(False)
        _NET = net
    except Exception:
        _UNAVAILABLE = True
    return _NET


def lpips_available() -> bool:
    return _load() is not None


def lpips(pred: np.ndarray, gt: np.ndarray) -> Optional[float]:
    """Perceptual distance between two (H, W, 3) images in [0, 1]:
    unit-normalized VGG16 feature differences averaged over the LPIPS tap
    layers (the uncalibrated LPIPS-vgg form — the learned per-channel
    weights also require a download). None when the backbone is
    unavailable."""
    net = _load()
    if net is None:
        return None
    import torch

    def prep(img):
        x = (np.asarray(img, np.float32) - _MEAN) / _STD
        return torch.from_numpy(x.transpose(2, 0, 1))[None]

    a, b = prep(pred), prep(gt)
    total, count = 0.0, 0
    with torch.no_grad():
        for i, layer in enumerate(net):
            a, b = layer(a), layer(b)
            if i in _TAPS:
                fa = a / a.norm(dim=1, keepdim=True).clamp_min(1e-8)
                fb = b / b.norm(dim=1, keepdim=True).clamp_min(1e-8)
                total += float(((fa - fb) ** 2).sum(dim=1).mean())
                count += 1
            if i >= max(_TAPS):
                break
    return total / count
