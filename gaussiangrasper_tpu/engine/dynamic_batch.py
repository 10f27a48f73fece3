"""Dynamic ray-batch sizing targeting a constant samples/batch.

The reference's DynamicBatchPipeline (ref /root/reference/nerfstudio/
pipelines/dynamic_batch.py:35-95) rescales num_rays_per_batch every step
by target_num_samples / measured_samples so that instant-ngp — whose
occupancy grid makes the live-sample count per ray vary wildly — keeps a
roughly constant amount of field work per step.

TPU redesign: the control law is identical, but the resulting ray count
is snapped to a power-of-two bucket between min_rays and max_rays. Under
`jit` every distinct batch shape compiles a separate program; free-running
counts would recompile almost every step, while bucketing bounds the
program count at log2(max/min)+1 (each bucket compiles once and is then
cached). The measured signal is the model's `num_live_samples` output
(models/nerf.py:_render_ingp — samples whose occupancy cell is live, the
static-shape analog of nerfacc's packed sample count).
"""

from __future__ import annotations

import math


class DynamicBatchSizer:
    """Tracks the ray count for the next batch.

    Args mirror the reference config (dynamic_batch.py:30-37):
      target_num_samples: total live samples to aim for per batch.
      max_num_samples_per_ray: dense samples per ray (sets the initial
        ray count exactly as the reference's __init__ does).
    """

    def __init__(
        self,
        target_num_samples: int = 1 << 18,
        max_num_samples_per_ray: int = 1 << 10,
        min_rays: int = 64,
        max_rays: int = 1 << 16,
    ):
        if min_rays & (min_rays - 1) or max_rays & (max_rays - 1):
            raise ValueError("min_rays/max_rays must be powers of two")
        self.target_num_samples = target_num_samples
        self.min_rays = min_rays
        self.max_rays = max_rays
        self._ideal = target_num_samples / max_num_samples_per_ray
        self.num_rays = self._bucket(self._ideal)

    def _bucket(self, ideal: float) -> int:
        """Nearest power of two (in log space), clipped to the range."""
        ideal = min(max(ideal, self.min_rays), self.max_rays)
        return 1 << round(math.log2(ideal))

    def update(self, num_samples_per_batch: int) -> int:
        """Feed the measured live-sample count of the last batch; returns
        the ray count for the next one. The un-bucketed ideal is tracked
        internally so repeated small corrections don't get quantized away
        (the reference multiplies its own running value the same way,
        dynamic_batch.py:71-76)."""
        self._ideal = self._ideal * (
            self.target_num_samples / max(int(num_samples_per_batch), 1)
        )
        self._ideal = min(max(self._ideal, self.min_rays), self.max_rays)
        self.num_rays = self._bucket(self._ideal)
        return self.num_rays
