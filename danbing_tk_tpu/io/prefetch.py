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
    re-raised at the consumer's next pull.

    If the consumer abandons iteration early (exception in its loop),
    it must call :meth:`close` — otherwise the producer thread stays
    blocked on a full queue and the wrapped reader's resources (e.g.
    the C FILE* of a NativeBatchReader) leak for the process lifetime.
    """

    def __init__(self, it, depth: int = 4):
        self._it = it
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._exhausted = False

        def _put(x) -> bool:
            # bounded blocking put that aborts when close() is called
            while not self._stop.is_set():
                try:
                    self._q.put(x, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def run():
            try:
                for x in it:
                    if not _put(x):
                        break
                else:
                    _put(_SENTINEL)
            except BaseException as e:  # noqa: BLE001 — relayed to consumer
                _put(e)
            finally:
                if self._stop.is_set():
                    # consumer abandoned us: release the reader's
                    # resources (producer thread owns the iterator, so
                    # this is race-free)
                    close = getattr(it, "close", None)
                    if close is not None:
                        close()

        self._t = threading.Thread(target=run, daemon=True,
                                   name="dtk-reader-prefetch")
        self._t.start()

    def __iter__(self):
        if self._exhausted:
            return
        while True:
            x = self._q.get()
            if x is _SENTINEL:
                self._exhausted = True
                return
            if isinstance(x, BaseException):
                self._exhausted = True
                raise x
            yield x

    def close(self):
        """Stop the producer and release the wrapped reader (idempotent;
        unnecessary after normal exhaustion, required after abandoning
        iteration mid-stream)."""
        self._stop.set()
        # unblock the producer if it is parked on a full queue
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._t.join(timeout=5.0)
        self._exhausted = True
