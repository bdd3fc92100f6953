"""Readers/writers for danbing-tk text k-mer formats (L0).

Format specs (de-facto API, see reference README.md:118-153 and
aQueryFasta_thread.h:926-950):

  *.tr/.fl/.ntr.kmers :  ">locus\\n" then "kmer\\tcount" lines (count optional;
                         align -o output omits ">locus" and kmer columns)
  *.graph.kmers       :  ">locus\\n" then "kmer\\tmask" lines, mask = 4-bit
                         TGCA out-edge presence
  *.tre.kmers         :  ">locus\\n" then "kmer" lines (set)
  FPSkmer.tsv (v2)    :  ">locus\\n" then "kmer\\tmin\\tmax" (bait)
  QC file             :  one ASCII 0/1 byte per locus

Parsed into insertion-ordered dicts so downstream writers can reproduce the
reference's hash-map insertion sequences exactly.
"""

from __future__ import annotations

import numpy as np


def count_loci(path: str) -> int:
    n = 0
    with open(path, "rb") as f:
        for line in f:
            if line.startswith(b">"):
                n += 1
    return n


def read_kmer_file(path: str, with_count: bool = True):
    """Returns list-of-dicts: per-locus {kmer: count} in file order.

    For graph files the value column is the edge mask; caller decides meaning.
    Lines without a second column get count 0.
    """
    dbs = []
    cur = None
    with open(path, "rb") as f:
        for line in f:
            if line.startswith(b">"):
                cur = {}
                dbs.append(cur)
            else:
                parts = line.split()
                km = int(parts[0])
                v = int(parts[1]) if (with_count and len(parts) > 1) else 0
                cur[km] = v
    return dbs


def read_kmer_sets(path: str):
    """*.tre.kmers-style: per-locus set of kmers (first column only)."""
    dbs = []
    cur = None
    with open(path, "rb") as f:
        for line in f:
            if line.startswith(b">"):
                cur = set()
                dbs.append(cur)
            else:
                cur.add(int(line.split()[0]))
    return dbs


def read_fps_kmers_v2(path: str, nloci: int):
    """Bait FPSkmer.tsv: ">locus" header carries the locus id (sparse).

    Returns list of dicts kmer -> packed u16 (min<<8 | max), matching
    readFPSKmersV2 (kmerIO.hpp:92-109).
    """
    dbs = [dict() for _ in range(nloci)]
    tri = -1
    with open(path, "rb") as f:
        for line in f:
            if line.startswith(b">"):
                tri = int(line[1:].split()[0])
            else:
                km, mi, ma = (int(x) for x in line.split()[:3])
                dbs[tri][km] = (mi << 8) + ma
    return dbs


def read_qc_file(path: str, nloci: int) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read(nloci)
    return np.frombuffer(data, dtype=np.uint8) - ord("0")


def write_kmers_with_name(path: str, dbs, threshold: int = 0) -> None:
    """">i\\nkmer\\tcount" writer (iteration order = dict order)."""
    with open(path, "w") as f:
        for i, db in enumerate(dbs):
            f.write(f">{i}\n")
            for km, c in db.items():
                if c < threshold:
                    continue
                f.write(f"{km}\t{c}\n")


def write_kmers(path: str, dbs, threshold: int = 0) -> None:
    """Counts only (align -o readable flavor, writeKmers :939-950)."""
    with open(path, "w") as f:
        for db in dbs:
            for _, c in db.items():
                if c < threshold:
                    continue
                f.write(f"{c}\n")


def iter_fasta_records(path: str):
    """Yield (name, sequence) per FASTA record; name is the first
    whitespace-separated token after '>'.  The one shared FASTA record
    parser for pipeline glue (build/qc) — keep multi-line handling and
    case in ONE place."""
    name, chunks = None, []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(chunks)
                name = line[1:].split()[0] if len(line) > 1 else ""
                chunks = []
            else:
                chunks.append(line)
    if name is not None:
        yield name, "".join(chunks)
