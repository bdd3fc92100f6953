"""Streaming row sink for text side-outputs (.kam / .aln / extracted
reads).

The reference emits these rows under the writer semaphore as it goes
(writeKmerAssignments, aQueryFasta_thread.cpp:1646-1681), so a full-WGS
`.kam` run (~1e8 rows, the baitBuilder input) is O(1) memory there.  The
round-2 runners accumulated rows as Python string lists for the whole
run, which exhausts host RAM at production scale; RowSink restores the
reference's streaming behavior while keeping the list-shaped interface
the engines already use (append/pop/len/iter).

Ordering: rows are flushed strictly in append order, so a bound sink
produces byte-identical files to the buffered path.  pop() (used by the
device runner to steal the referee's freshly appended row) is only ever
called immediately after an append; flushes happen *before* an insert,
so the newest row is always still poppable.
"""

from __future__ import annotations


class RowSink:
    def __init__(self, path: str | None = None, fh=None,
                 flush_every: int = 8192, append: bool = False):
        """``append=True`` keeps an existing file's bytes (crash-resume:
        the checkpoint loader then truncates back to its saved
        high-water mark via truncate_to); the default truncates."""
        self._buf: list[str] = []
        self._own = False
        self.path = path
        if path is not None:
            assert fh is None
            import os as _os

            if append and _os.path.exists(path):
                self._fh = open(path, "r+")
                self._fh.seek(0, 2)
            else:
                self._fh = open(path, "w")
            self._own = True
        else:
            self._fh = fh
        self.flush_every = flush_every
        self.n_written = 0

    # -- list-shaped interface --

    def append(self, row: str):
        if self._fh is not None and len(self._buf) >= self.flush_every:
            self.flush()
        self._buf.append(row)

    def pop(self) -> str:
        # valid only for the unflushed tail; see module docstring
        return self._buf.pop()

    def __len__(self) -> int:
        return self.n_written + len(self._buf)

    def __iter__(self):
        if self.n_written:
            raise RuntimeError(
                "rows already streamed to disk; iterate the file instead")
        return iter(self._buf)

    # -- streaming --

    def flush(self):
        if self._fh is not None and self._buf:
            self._fh.writelines(self._buf)
            self.n_written += len(self._buf)
            self._buf.clear()

    def byte_offset(self) -> int:
        """Durable byte high-water mark (flushes first); checkpoints
        record this so resume can truncate rows written past the saved
        cursor."""
        self.flush()
        self._fh.flush()
        return self._fh.tell()

    def truncate_to(self, nbytes: int, nrows: int):
        """Crash-resume: drop rows past the checkpoint's high-water mark
        (the sink must have been opened with append=True)."""
        assert self._own and self._fh is not None
        self._buf.clear()
        self._fh.flush()
        self._fh.seek(nbytes)
        self._fh.truncate(nbytes)
        self.n_written = nrows

    def close(self):
        self.flush()
        if self._own and self._fh is not None:
            self._fh.close()
        self._fh = None


def finalize_rows(rows, path: str):
    """Writer used by write_kam/write_aln: streams a bound RowSink to
    completion, or writes a plain list in one shot (legacy path)."""
    if isinstance(rows, RowSink) and rows.path is not None:
        assert rows.path == path, (rows.path, path)
        rows.close()
        return
    with open(path, "w") as f:
        f.writelines(rows)


def finalize_rows_fh(rows, fh):
    """Writer used by write_extract (arbitrary file handle)."""
    if isinstance(rows, RowSink) and rows._fh is not None:
        rows.flush()
        return
    fh.writelines(rows)
