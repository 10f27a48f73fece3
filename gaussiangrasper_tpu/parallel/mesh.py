"""Device mesh construction for sharded Gaussian-splatting training.

The reference's only cross-device mechanism is NCCL DDP (one process per
GPU, gradient all-reduce — /root/reference/nerfstudio/scripts/train.py:
139-145, pipelines/base_pipeline.py:304). The TPU-native design replaces it
with a 2-axis `jax.sharding.Mesh`:

  "dp"    — data parallelism over cameras: each dp group renders a
            different camera of the per-step batch (the DDP analog, but
            batched inside ONE jitted program instead of N processes).
  "gauss" — primitive sharding: the Gaussian field (and its optimizer
            state) is sharded along the capacity axis. Projection/SH are
            embarrassingly parallel over this axis; the binning sort and
            tile compositing induce XLA all-gathers of the *culled* subset
            over ICI.

Gradient all-reduce across "dp" and re-scatter across "gauss" are inserted
by XLA from the sharding annotations (pjit), overlapped with backward —
nothing hand-written, per the scaling-book recipe.

Multi-host: `jax.distributed.initialize()` (scripts own that call); this
module only ever sees the global device list.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: Optional[int] = None,
    gauss: Optional[int] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("dp", "gauss") mesh over `devices` (default: all).

    With only one of dp/gauss given, the other absorbs the remaining
    devices. Defaults to pure gaussian sharding (dp=1): the reference
    trains one camera per step, and primitive sharding is what scales the
    render itself.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if dp is None and gauss is None:
        dp, gauss = 1, n
    elif dp is None:
        dp = n // gauss
    elif gauss is None:
        gauss = n // dp
    if dp * gauss != n:
        raise ValueError(f"dp({dp}) * gauss({gauss}) != device count ({n})")
    return Mesh(np.asarray(devs).reshape(dp, gauss), ("dp", "gauss"))
