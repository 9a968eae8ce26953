"""Threaded read-ahead input wrapper — the analogue of open_file_thread
/ read_frame_thread (muxers.c:441-531): a producer thread decodes the
next frame(s) from the underlying reader into a bounded queue while the
encoder works on the current one, hiding input I/O latency behind
device compute."""

from __future__ import annotations

import queue
import threading

_EOF = object()


class ThreadedReader:
    """Wraps any frame iterator (Y4MReader/YUVReader — each yields
    (y, u, v) planes); prefetches up to `depth` frames on a daemon
    thread (the reference prefetches one, muxers.c:469-491)."""

    def __init__(self, reader, depth: int = 2):
        self._reader = reader
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._err = None
        self._t = threading.Thread(target=self._produce, daemon=True)
        self._t.start()

    def __getattr__(self, name):
        # geometry/fps metadata passes through to the inner reader
        return getattr(self._reader, name)

    def _produce(self):
        try:
            for frame in self._reader:
                self._q.put(frame)
        except Exception as e:          # surfaced on the consumer side
            self._err = e
        self._q.put(_EOF)

    def __iter__(self):
        return self

    def __next__(self):
        frame = self._q.get()
        if frame is _EOF:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return frame

    def close(self):
        inner_close = getattr(self._reader, "close", None)
        if inner_close is not None:
            inner_close()
