"""ctypes bindings for the native (C++) graph-threading engine.

``build/libdtk_thread.so`` implements the same algorithm as
``engine.threading`` (isThreadFeasible + error correction + CIGAR
surgery) at C++ speed.  The host threading fallback is the serial
bottleneck of threading-mode runs — the TPU DFA resolves clean walks,
everything else lands here.

The wrapper returns results in the exact shapes ``host_align._thread_pair``
consumes: an ``es`` list compatible with ``threading.write_cigar``, the
``tr`` annotation list for ``write_annot``, and the corrected k-mer
stream (with NAN64 placeholders preserved) for counting.

Validated byte-exact against the Python engine / the reference oracle by
tests/test_native_thread.py.
"""

from __future__ import annotations

import ctypes as C
import os

import numpy as np

_LIB = None


def _find_lib():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "build", "libdtk_thread.so")


def available() -> bool:
    return os.path.exists(_find_lib())


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    lib = C.CDLL(_find_lib())
    lib.dtk_graph_new.restype = C.c_void_p
    lib.dtk_graph_add.argtypes = [C.c_void_p, C.POINTER(C.c_uint64),
                                  C.POINTER(C.c_uint8), C.c_int64]
    lib.dtk_graph_free.argtypes = [C.c_void_p]
    lib.dtk_thread_read.restype = C.c_int
    lib.dtk_thread_read.argtypes = [
        C.c_void_p, C.c_void_p, C.c_char_p, C.c_int64, C.c_uint64,
        C.c_int, C.c_uint64, C.c_int, C.c_char_p,
        C.POINTER(C.c_int64), C.c_char_p, C.POINTER(C.c_int64),
        C.POINTER(C.c_uint64), C.POINTER(C.c_int64)]
    _LIB = lib
    return lib


class _CGraph:
    __slots__ = ("h", "lib")

    def __init__(self, lib, kv: dict):
        self.lib = lib
        self.h = lib.dtk_graph_new()
        n = len(kv)
        if n:
            keys = np.fromiter(kv.keys(), dtype=np.uint64, count=n)
            vals = np.fromiter((v & 0xFF for v in kv.values()),
                               dtype=np.uint8, count=n)
            lib.dtk_graph_add(
                self.h, keys.ctypes.data_as(C.POINTER(C.c_uint64)),
                vals.ctypes.data_as(C.POINTER(C.c_uint8)), n)

    def __del__(self):
        if self.h:
            self.lib.dtk_graph_free(self.h)
            self.h = None


class NativeThreader:
    """Per-RPGG cache of native graph handles + the thread_read call.

    ``thread_read`` is THREAD-SAFE (per-call scratch buffers; the C++
    walk only reads the shared graph handles), so a pool can fan calls
    across cores — ctypes releases the GIL for the engine's duration.
    ``prepare`` mutates the handle cache and must stay on one thread."""

    def __init__(self):
        self.lib = _load()
        self._graphs: dict[int, _CGraph] = {}
        self._trks: dict[int, _CGraph] = {}

    def prepare(self, locus: int, graph: dict, tr_counts: dict):
        if locus not in self._graphs:
            self._graphs[locus] = _CGraph(self.lib, graph)
            self._trks[locus] = _CGraph(
                self.lib, {k: 0 for k in tr_counts})

    def prepared(self, locus: int) -> bool:
        return locus in self._graphs

    def thread_read(self, locus: int, seq: str, thread_cth: int,
                    correction: bool, ksize: int, maxncorrection: int):
        """-> (status, es, tr, kmers); es rows are [type, '', graph_nuc]
        (read nucleotides are never consulted by write_cigar)."""
        cap = 4 * max(len(seq), 64)
        es_buf = C.create_string_buffer(cap)
        tr_buf = C.create_string_buffer(cap)
        km_buf = np.empty(cap, dtype=np.uint64)
        es_len = C.c_int64(cap)
        tr_len = C.c_int64(cap)
        nk = C.c_int64(cap)
        st = self.lib.dtk_thread_read(
            self._graphs[locus].h, self._trks[locus].h,
            seq.encode(), len(seq), thread_cth, int(correction), ksize,
            maxncorrection, es_buf, C.byref(es_len), tr_buf,
            C.byref(tr_len), km_buf.ctypes.data_as(
                C.POINTER(C.c_uint64)), C.byref(nk))
        raw = es_buf.raw[:es_len.value]
        es = []
        i = 0
        while i < len(raw):
            t = chr(raw[i])
            i += 1
            if t in ("X", "D"):
                gch = chr(raw[i])
                i += 1
                es.append([t, "", gch])
            else:
                es.append([t, "", ""])
        tr = [chr(b) for b in tr_buf.raw[:tr_len.value]]
        kmers = [int(x) for x in km_buf[:nk.value]]
        return st, es, tr, kmers


class ParallelThreader:
    """Fans the thread-safe engine calls over a worker pool.

    The native funnel submits both mates' walks as soon as a pair is
    known to need host correction (at step-fetch time) and consumes the
    futures when the pair's ordinal comes up — the engine (ctypes, GIL
    released) runs on all cores inside the device-queue shadow while
    results still apply in pair order."""

    def __init__(self, nthr: NativeThreader, cfg, nworkers: int | None = None):
        from concurrent.futures import ThreadPoolExecutor

        self.nthr = nthr
        self.cfg = cfg
        self.pool = ThreadPoolExecutor(
            nworkers or max((os.cpu_count() or 2) - 1, 1))

    def submit_read(self, dest: int, seq: str):
        cfg = self.cfg
        assert self.nthr.prepared(dest), "prepare() must precede submit"
        return self.pool.submit(
            self.nthr.thread_read, dest, seq, cfg.thread_cth,
            cfg.correction, cfg.ksize, cfg.maxncorrection)

    def close(self):
        self.pool.shutdown(wait=True)
