"""Background-thread iterator prefetch for the production ingest loop.

The C++ batch reader (native_reader) parses + packs at ~570 MB/s, which
is serial time between device dispatches in the align loop.  Running it
in a producer thread behind a bounded queue overlaps file IO/packing
with dispatch + drain (ctypes foreign calls release the GIL), without
changing batch order or content.
"""

from __future__ import annotations

import queue
import threading


_SENTINEL = object()


class PrefetchIterator:
    """Wraps an iterable; a daemon thread eagerly pulls up to ``depth``
    items ahead.  Iteration order is preserved; producer exceptions are
    re-raised at the consumer's next pull."""

    def __init__(self, it, depth: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=depth)

        def run():
            try:
                for x in it:
                    self._q.put(x)
                self._q.put(_SENTINEL)
            except BaseException as e:  # noqa: BLE001 — relayed to consumer
                self._q.put(e)

        self._t = threading.Thread(target=run, daemon=True,
                                   name="dtk-reader-prefetch")
        self._t.start()

    def __iter__(self):
        while True:
            x = self._q.get()
            if x is _SENTINEL:
                return
            if isinstance(x, BaseException):
                raise x
            yield x
