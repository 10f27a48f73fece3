"""Background batch prefetching.

Role of the reference's ParallelDataManager (/root/reference/nerfstudio/
data/datamanagers/parallel_datamanager.py:79-200: DataProcessor mp.Process
workers pre-generating batches through a queue). Threads suffice here: the
per-step host work is numpy/cv2/C++ (GIL released), and batches must land
as jax arrays in the main process anyway.
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

from gaussiangrasper_tpu.data.manager import FullImageDatamanager


class PrefetchingDatamanager:
    """Wraps a FullImageDatamanager; a worker thread keeps `depth` batches
    ready so the accelerator never waits on sampling/IO."""

    def __init__(self, dm: FullImageDatamanager, depth: int = 2):
        self.dm = dm
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._fill, daemon=True)
        self._worker.start()

    def _fill(self) -> None:
        while not self._stop.is_set():
            try:
                item = self.dm.next_train()
            except BaseException as e:  # propagate instead of dying silently
                item = e
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.25)
                    break
                except queue.Full:
                    continue
            if isinstance(item, BaseException):
                return

    def next_train(self):
        item = self._q.get()
        if isinstance(item, BaseException):
            raise item
        return item

    def __len__(self) -> int:
        return len(self.dm)

    def __getattr__(self, name):
        return getattr(self.dm, name)

    def close(self) -> None:
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._worker.join(timeout=2.0)
