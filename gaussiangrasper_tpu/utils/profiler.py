"""Profiling hooks: lightweight wall-time profiler + XLA trace capture.

Role of the reference's nerfstudio/utils/profiler.py: the decorator-based
wall-time profiler (:59-131, printed at exit) and the "capture a chrome
trace at fixed steps" integration (:149-196, PytorchProfiler at steps
12/17). The TPU analog records host wall times per tagged section and dumps
a jax.profiler trace (xplane, viewable in TensorBoard/Perfetto) for a
configurable step window.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional

import jax


class Profiler:
    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def time_function(self, fn, name: Optional[str] = None):
        tag = name or fn.__qualname__

        def wrapped(*a, **kw):
            with self.section(tag):
                return fn(*a, **kw)

        return wrapped

    def summary(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        lines = [f"{'section':<40} {'total s':>10} {'calls':>8} {'ms/call':>10}"]
        for name, tot in rows:
            n = self.counts[name]
            lines.append(f"{name:<40} {tot:>10.2f} {n:>8d} {tot / n * 1e3:>10.2f}")
        return "\n".join(lines)

    def flush(self) -> None:
        if self.totals:
            print(self.summary(), flush=True)


PROFILER = Profiler()


class TraceCapture:
    """Capture an XLA device trace for steps [start, stop) (the analog of
    the reference capturing chrome traces at steps 12/17)."""

    def __init__(self, log_dir: Path, start_step: int = 12, num_steps: int = 5):
        self.log_dir = Path(log_dir)
        self.start = start_step
        self.stop = start_step + num_steps
        self._active = False

    def maybe_step(self, step: int) -> None:
        if step == self.start and not self._active:
            self.log_dir.mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(str(self.log_dir))
            self._active = True
        elif step == self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
            print(f"profiler trace written to {self.log_dir}", flush=True)

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
