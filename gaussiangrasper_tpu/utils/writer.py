"""Metrics fan-out: terminal dashboard + optional TensorBoard.

Role of the reference's event-buffered writer (/root/reference/nerfstudio/
utils/writer.py:73-162, 306-525): scalars/images buffered per step and
flushed to the chosen backends, plus a rate counter giving the reference's
TRAIN_RAYS_PER_SEC (pixels/s here — engine/trainer.py:262-270).
"""

from __future__ import annotations

import time
from collections import deque
from pathlib import Path
from typing import Dict, Optional

import numpy as np


class MetricsWriter:
    def __init__(
        self,
        log_dir: Optional[Path] = None,
        tensorboard: bool = False,
        steps_per_log: int = 10,
        max_steps: int = 30000,
    ):
        self.steps_per_log = steps_per_log
        self.max_steps = max_steps
        self._tb = None
        if tensorboard and log_dir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(log_dir))
            except Exception:
                self._tb = None
        self._times = deque(maxlen=20)
        self._last = time.perf_counter()

    def step(self, step: int, metrics: Dict[str, float], pixels: int = 0) -> None:
        now = time.perf_counter()
        self._times.append(now - self._last)
        self._last = now
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"train/{k}", float(v), step)
        if step % self.steps_per_log == 0:
            it_s = np.mean(self._times) if self._times else 0.0
            px_s = pixels / it_s if it_s > 0 else 0.0
            eta = (self.max_steps - step) * it_s
            parts = " ".join(
                f"{k}={float(v):.4g}" for k, v in metrics.items() if np.isscalar(v)
                or getattr(v, "ndim", 1) == 0
            )
            print(
                f"[{step:6d}/{self.max_steps}] {parts} "
                f"| {it_s * 1e3:.0f} ms/it {px_s / 1e6:.2f} Mpx/s eta {eta / 60:.1f}m",
                flush=True,
            )

    def image(self, step: int, tag: str, img: np.ndarray) -> None:
        if self._tb is not None:
            self._tb.add_image(tag, img, step, dataformats="HWC")

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
