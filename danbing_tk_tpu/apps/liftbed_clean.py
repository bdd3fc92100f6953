"""Liftover bed cleanup (liftbed.clean.py equivalent, reference
script/liftbed.clean.py).

Merges split liftover segments (<10kb gaps), drops multi-contig or
off-major-chromosome mappings (majority vote >= 0.6 per contig), and tags
strand consistency (1/-1/0)."""

from __future__ import annotations

from collections import defaultdict


class _Dup:
    __slots__ = ("dup", "valid", "asm", "regions", "start", "end", "strand")

    def __init__(self):
        self.dup = False
        self.valid = True
        self.asm = ""
        self.regions = []
        self.start = -1
        self.end = -1
        self.strand = []


def liftbed_clean(rows, out):
    """rows: [(ctg, s, e, name, score, strand)] in sorted liftbed order;
    writes cleaned rows to the ``out`` stream."""
    r2a: dict[str, _Dup] = {}
    order: list[str] = []
    for f1, f2, f3, f4, _, f6 in rows:
        r = "_".join(f4.split("_")[:3])
        f2, f3 = int(f2), int(f3)
        if r not in r2a:
            d = r2a[r] = _Dup()
            order.append(r)
            d.asm = f1
            d.regions.append((f2, f3))
            d.start = f2
            d.end = f3
            d.strand.append(f6)
        else:
            d = r2a[r]
            if not d.valid:
                continue
            if d.asm == f1:
                d.dup = True
                d1 = f2 - d.end
                d2 = f3 - d.start
                d3 = d.start - f3
                if d1 <= 0 and d2 >= 0:
                    d.start = min(d.start, f2)
                    d.end = max(d.end, f3)
                    d.regions.append((f2, f3))
                    d.strand.append(f6)
                elif 0 < d1 < 1e4:
                    d.end = f3
                    d.regions.append((f2, f3))
                    d.strand.append(f6)
                elif 0 < d3 < 1e4:
                    d.start = f2
                    d.regions.append((f2, f3))
                    d.strand.append(f6)
                else:
                    d.valid = False
            else:
                d.valid = False

    a2ch: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for f1, _, _, f4, _, _ in rows:
        a2ch[f1][f4.split("_")[0][3:]] += 1
    a2mc = {}
    for asm, chs in a2ch.items():
        tc = sum(chs.values())
        mch, mc = max(chs.items(), key=lambda kv: kv[1])
        # replicate reference tie behavior: first max encountered wins
        mc = 0
        for ch, c in chs.items():
            if c > mc:
                mch, mc = ch, c
        if mc / tc >= 0.6:
            a2mc[asm] = mch

    s2i = {"+": 1, "-": -1}
    for r in order:
        d = r2a[r]
        rr = "\t".join(r.split("_"))
        if d.valid and d.asm in a2mc:
            ch = r.split("_")[0][3:]
            if ch == a2mc[d.asm]:
                strand = int(all(s == d.strand[0] for s in d.strand)) * \
                    s2i[d.strand[0]]
                out.write(f"{d.asm}\t{d.start}\t{d.end}\t{rr}\t{strand}\n")
