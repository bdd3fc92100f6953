"""Runnable VNTR length-prediction pipeline (P8/P9 end-to-end).

The reference ships this flow as ``script/kmc2length.py`` (main at
:119-139), whose HEAD main is broken: ``loadvntrmat`` passes the output
row where ``readKms`` expects the per-locus cumulative k-mer index
(``ki_tr``) and discards the return (kmc2length.py:19-23 vs
vntrutils.py:160-193).  This module implements the INTENDED flow — the
same file formats, the same math (oracle-tested against the reference's
own functions in tests/test_length_pipeline_oracle.py) — with the ksi
index supplied explicitly:

  inputs   --trbed    VNTR bed (nloci rows; row ids name the output rows)
           --LSB      precomputed locus-specific-bias TSV (release asset
                      format: nctrl non-TR rows then nloci TR rows,
                      columns = panel genomes; ctrl sizes parse from the
                      non-TR row names, loadLSB kmc2length.py:53-61)
           --cov      per-sample control-region coverage table (cols 2+
                      = coverage per ctrl region, kmc2length.py:126-128)
           --kmers    file listing per-sample count-only kmer files
                      (the align output format, README.md:153)
           --ksi      per-locus cumulative k-mer index (`ktools ksi`)
                      or --qs RPGG prefix to derive it from pan.tr.kmers
  output   {outdir}/estimated_TR_len.tsv  (loci x samples, na_rep=nan)

The optional ``--seqruns`` input switches the LSB-donor pick to the
sequencing-run prior of the LOO variant (kmc2length.LOO.py:107-120).
"""

from __future__ import annotations

import os

import numpy as np

from .kmc2length import (kmc2length, process_ctrl_cov, read_locus_sums)


def load_lsb(path: str, nloci: int):
    """LSB release-asset TSV -> (trbias_db, ntrbias_db, dbgenomes,
    ctrlsize); rows = nctrl non-TR regions then nloci TR loci, columns =
    panel genomes (loadLSB, kmc2length.py:53-61)."""
    import pandas as pd

    df = pd.read_csv(path, sep="\t", index_col=0)
    nloci0 = df.shape[0] - nloci
    assert nloci0 > 0, (
        f"LSB has {df.shape[0]} rows but the bed names {nloci} loci")
    ntrbias_db = df.iloc[:nloci0].to_numpy().T
    trbias_db = df.iloc[nloci0:].to_numpy().T
    dbgenomes = np.array(df.columns)
    cbed = np.array([v[4:].split("_") for v in df.index[:nloci0]],
                    dtype=object)
    ctrlsize = cbed[:, 2].astype(int) - cbed[:, 1].astype(int)
    return trbias_db, ntrbias_db, dbgenomes, ctrlsize


def load_cov(path: str) -> np.ndarray:
    """Raw coverage table -> (nsamples, nctrl) float matrix (columns 0-1
    are sample metadata, kmc2length.py:126-127)."""
    raw = np.loadtxt(path, dtype=object, ndmin=2)
    return raw[:, 2:].astype(float)


def load_trmat(kmers_list: str, ksi: list[int]) -> np.ndarray:
    """Per-sample locus k-mer sums from count-only kmer files (the
    intended loadvntrmat: readKms with a real ki_tr index)."""
    files = [ln.strip() for ln in open(kmers_list) if ln.strip()]
    base = os.path.dirname(os.path.abspath(kmers_list))
    rows = []
    for f in files:
        p = f if os.path.isabs(f) else os.path.join(base, f)
        if not os.path.exists(p) and os.path.exists(f):
            p = f
        rows.append(read_locus_sums(p, ksi))
    return np.array(rows, dtype=np.int64)


def save_estimates(ests: np.ndarray, trbed: np.ndarray, outdir: str):
    """estimated_TR_len.tsv, byte-compatible with SaveEstErr
    (kmc2length.py:100-103): loci x samples, row ids = '_'.join(bed
    row), na_rep='nan'."""
    import pandas as pd

    trid = ["_".join(r) for r in trbed]
    df = pd.DataFrame(ests.T, index=trid)
    os.makedirs(outdir, exist_ok=True)
    df.to_csv(os.path.join(outdir, "estimated_TR_len.tsv"), sep="\t",
              na_rep="nan")


def run_length(outdir: str, ksize: int, kmers: str, trbed_path: str,
               lsb: str, cov: str, ksi_path: str | None = None,
               qs: str | None = None, seqruns: str | None = None,
               db_seqruns: str | None = None,
               bad_donors: tuple = ()) -> np.ndarray:
    """The intended kmc2length main; returns (nsamples, nloci) length
    estimates and writes estimated_TR_len.tsv."""
    trbed = np.loadtxt(trbed_path, dtype=object, ndmin=2)
    nloci = trbed.shape[0]
    trbias_db, ntrbias_db, dbgenomes, ctrlsize = load_lsb(lsb, nloci)

    covmat = load_cov(cov)
    assert covmat.shape[1] == len(ctrlsize), (
        f"coverage table has {covmat.shape[1]} ctrl regions, LSB names "
        f"{len(ctrlsize)}")
    pbamcov, _, ntrbiasmat = process_ctrl_cov(covmat, ctrlsize)

    if ksi_path is not None:
        ksi = [int(x) for x in open(ksi_path).read().split()]
    else:
        assert qs is not None, "need --ksi or --qs to index kmer files"
        from ..apps.ktools import ksi as make_ksi

        ksi = make_ksi(qs + ".tr.kmers")
    assert len(ksi) == nloci, (
        f"ksi indexes {len(ksi)} loci, bed names {nloci}")
    trmat = load_trmat(kmers, ksi)

    runs = runs_db = None
    if seqruns is not None:
        runs = [ln.split()[1] for ln in open(seqruns) if ln.strip()]
        assert len(runs) == trmat.shape[0], "one seqrun label per sample"
        if db_seqruns is not None:
            runs_db = [ln.split()[1] for ln in open(db_seqruns)
                       if ln.strip()]
            assert len(runs_db) == len(dbgenomes), \
                "one seqrun label per LSB panel genome"
    ests = kmc2length(trmat, ntrbiasmat, trbias_db, ntrbias_db,
                      pbamcov, ksize, runs=runs, runs_db=runs_db,
                      bad_donors=bad_donors)
    save_estimates(ests, trbed, outdir)
    return ests
