"""Background batch prefetching.

The reference's loader runs synchronously on the training thread (cv2
imread + RLE decode per step, gt_mrcn_loader.py:119-131) — host work
serialized with GPU work. Here a daemon thread keeps a bounded queue of
ready batches so host preprocessing overlaps device steps (the native
batched RLE op in csrc/ does the heavy mask decode with OpenMP)."""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional


class Prefetcher:
    def __init__(self, next_batch: Callable[[], Dict], depth: int = 2):
        self._next = next_batch
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._exc: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while not self._stop.is_set():
            try:
                batch = self._next()
            except BaseException as e:   # surface on the consumer side
                self._exc = e
                self._q.put(None)
                return
            self._q.put(batch)

    def get(self) -> Dict:
        item = self._q.get()
        if item is None and self._exc is not None:
            raise self._exc
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __iter__(self) -> Iterator[Dict]:
        while True:
            yield self.get()
