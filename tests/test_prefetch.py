"""PrefetchIterator lifecycle: order, exceptions, abandon-and-close."""

import time

from danbing_tk_tpu.io.prefetch import PrefetchIterator


class TrackedReader:
    """Iterable with a close() the prefetcher must call on abandon."""

    def __init__(self, n):
        self.n = n
        self.closed = False

    def __iter__(self):
        for i in range(self.n):
            yield i
        self.close()

    def close(self):
        self.closed = True


def test_order_preserved():
    r = TrackedReader(100)
    assert list(PrefetchIterator(r, depth=4)) == list(range(100))
    assert r.closed


def test_exception_relayed():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = iter(PrefetchIterator(gen(), depth=2))
    assert next(it) == 1
    try:
        next(it)
        raise AssertionError("expected RuntimeError")
    except RuntimeError:
        pass


def test_abandon_and_close_releases_reader():
    r = TrackedReader(1000)
    pf = PrefetchIterator(r, depth=2)
    it = iter(pf)
    next(it)  # producer is now parked on a full queue
    pf.close()
    # producer thread exits and closes the underlying reader
    deadline = time.time() + 5
    while not r.closed and time.time() < deadline:
        time.sleep(0.01)
    assert r.closed
    assert not pf._t.is_alive()
    # iteration after close terminates instead of hanging
    assert list(pf) == []


def test_reiterate_after_exhaustion_terminates():
    pf = PrefetchIterator(TrackedReader(3), depth=2)
    assert list(pf) == [0, 1, 2]
    assert list(pf) == []  # no hang on a drained queue
