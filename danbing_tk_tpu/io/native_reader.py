"""ctypes binding for the native streaming pair reader (production IO).

Yields pre-packed (codes (2P,L) u8, rlen (2P,) i32, titles list) batches at
C speed; behaviorally identical to engine.host_align.iter_fasta_pairs +
pack (same pairing map semantics, same pair order).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
_LIBPATH = os.path.join(_ROOT, "build", "libdtk_native.so")
_lib = None


def _native():
    global _lib
    if _lib is None:
        src = os.path.join(_ROOT, "native", "dtk_native.cpp")
        if (not os.path.exists(_LIBPATH)
                or os.path.getmtime(_LIBPATH) < os.path.getmtime(src)):
            subprocess.run(["make", "-C", os.path.join(_ROOT, "native")],
                           check=True)
        _lib = ctypes.CDLL(_LIBPATH)
        _lib.dtk_reader_open.restype = ctypes.c_void_p
        _lib.dtk_reader_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                         ctypes.c_int]
        _lib.dtk_reader_next_batch.restype = ctypes.c_int64
        _lib.dtk_reader_next_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64]
        _lib.dtk_reader_next_batch_q.restype = ctypes.c_int64
        _lib.dtk_reader_next_batch_q.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
        _lib.dtk_reader_close.argtypes = [ctypes.c_void_p]
        _lib.dtk_sample_queries.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8)]
    return _lib


def sample_queries(codes: np.ndarray, rlen: np.ndarray, k: int, nf: int):
    """Native twin of ops.kmers_np.sample_subfilter_queries (same
    returns); ~10x the numpy path on the hostq prefilter's hot loop."""
    lib = _native()
    B = codes.shape[0]
    codes = np.ascontiguousarray(codes)
    rlen = np.ascontiguousarray(rlen, dtype=np.int32)
    qlo = np.empty((B, nf), np.uint32)
    qhi = np.empty((B, nf), np.uint32)
    valid = np.empty((B, nf), np.uint8)
    nonshort = np.empty(B, np.uint8)
    lib.dtk_sample_queries(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rlen.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        B, codes.shape[1], k, nf,
        qlo.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        qhi.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        nonshort.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return qlo, qhi, valid.view(np.bool_), nonshort.view(np.bool_)


class NativeBatchReader:
    TITLE_STRIDE = 256

    def __init__(self, path: str, P: int, L: int, is_fastq: bool = False,
                 min_read_size: int = 0, with_titles: bool = True,
                 with_quals: bool = False):
        lib = _native()
        self.lib = lib
        self.P, self.L = P, L
        self.with_titles = with_titles
        self.with_quals = with_quals and is_fastq
        self.h = lib.dtk_reader_open(path.encode(), int(is_fastq),
                                     min_read_size)
        if not self.h:
            raise FileNotFoundError(path)

    def __iter__(self):
        """Yields (codes, rlen, n, titles) — or, with ``with_quals``,
        (codes, rlen, n, titles, quals) where quals is (2P, L) u8 of raw
        ASCII phred+33 bytes (0-padded)."""
        lib = self.lib
        P, L = self.P, self.L
        while True:
            codes = np.full((2 * P, L), 255, dtype=np.uint8)
            rlen = np.zeros(2 * P, dtype=np.int32)
            tbuf = ctypes.create_string_buffer(P * self.TITLE_STRIDE) \
                if self.with_titles else None
            quals = np.zeros((2 * P, L), dtype=np.uint8) \
                if self.with_quals else None
            n = lib.dtk_reader_next_batch_q(
                self.h, codes.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_uint8)),
                rlen.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                quals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
                if quals is not None else None,
                P, L, tbuf, self.TITLE_STRIDE)
            if n == 0:
                break
            titles = None
            if self.with_titles:
                titles = [
                    ctypes.string_at(
                        ctypes.addressof(tbuf) + i * self.TITLE_STRIDE
                    ).decode()
                    for i in range(n)]
            if self.with_quals:
                yield codes, rlen, int(n), titles, quals
            else:
                yield codes, rlen, int(n), titles
        lib.dtk_reader_close(self.h)
        self.h = None

    def close(self):
        """Release the C FILE* (idempotent; iteration also closes at
        exhaustion).  Callers that may abandon iteration mid-file must
        call this, or the handle leaks for the process lifetime."""
        if self.h is not None:
            self.lib.dtk_reader_close(self.h)
            self.h = None
