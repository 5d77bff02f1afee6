"""Prefetching frame loader: overlap PNG decode with device compute.

The reference loads every frame synchronously inside the scan loop
(main_ps.cpp:167); at 2-megapixel 16-bit PNGs the decode alone costs
0.2-0.4 s/frame — comparable to the whole fused TPU frame step.  This
wrapper decodes ahead on a worker thread (cv2's native decoder releases
the GIL) so the device never waits on disk.
"""

from __future__ import annotations

import queue
import threading
from typing import Optional, Tuple

import numpy as np

from psgradientsdf_tpu.io.loaders import ImageLoader


class PrefetchLoader:
    """Wraps an ImageLoader; load_next() returns pre-decoded frames.

    Timestamps are captured at decode time and replayed in order, so the
    rgb_timestamp/depth_timestamp contract of the base loader holds.
    """

    def __init__(self, loader: ImageLoader, depth: int = 4):
        self._loader = loader
        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._thread: Optional[threading.Thread] = None
        self.timestamp_rgb = ""
        self.timestamp_depth = ""
        self._start()

    # pass-throughs
    @property
    def K(self):
        return self._loader.K

    @property
    def rgb_timestamp(self) -> str:
        return self.timestamp_rgb

    @property
    def depth_timestamp(self) -> str:
        return self.timestamp_depth

    def load_intrinsics(self, filename: str = "intrinsics.txt") -> bool:
        return self._loader.load_intrinsics(filename)

    def load_pose(self, filename: str):
        return self._loader.load_pose(filename)

    def _start(self) -> None:
        self._stop = threading.Event()
        q, stop, loader = self._queue, self._stop, self._loader

        def worker():
            while not stop.is_set():
                item = loader.load_next()
                payload = None if item is None else (
                    item[0], item[1], loader.rgb_timestamp, loader.depth_timestamp
                )
                # bounded put that aborts promptly on reset
                while not stop.is_set():
                    try:
                        q.put(payload, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if payload is None:
                    return

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def load_next(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        item = self._queue.get()
        if item is None:
            return None
        color, depth, ts_rgb, ts_depth = item
        self.timestamp_rgb = ts_rgb
        self.timestamp_depth = ts_depth
        return color, depth

    def reset(self) -> None:
        # stop the worker (it aborts any blocked put), drain, restart
        if self._thread is not None:
            self._stop.set()
            while self._thread.is_alive():
                try:
                    self._queue.get(timeout=0.05)
                except queue.Empty:
                    pass
            self._thread.join()
        self._loader.reset()
        self._queue = queue.Queue(maxsize=self._queue.maxsize)
        self._start()

    def reset_counter(self) -> None:
        self.reset()
