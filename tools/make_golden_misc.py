#!/usr/bin/env python
"""Golden fixtures for small analysis scripts runnable as oracles with the
statsmodels shim: SelectRegions.py and liftbed.clean.py."""

import os
import subprocess
import sys

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")
OUT = os.path.join(ROOT, "tests", "golden_misc")
REF = "/root/reference/script"


def main():
    os.makedirs(OUT, exist_ok=True)
    os.makedirs("/tmp/pyshims/statsmodels", exist_ok=True)
    for fn in ("__init__.py", "api.py"):
        with open(f"/tmp/pyshims/statsmodels/{fn}", "w") as f:
            f.write("# stub\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = REF + os.pathsep + "/tmp/pyshims"
    rng = np.random.default_rng(5)

    # --- SelectRegions fixture ---
    with open(os.path.join(OUT, "ref.fa"), "w") as f:
        for i in range(3):
            seq = "".join("acgt"[j] for j in rng.integers(0, 4, 500))
            f.write(f">ctg{i}\n")
            for p in range(0, 500, 70):
                f.write(seq[p : p + 70] + "\n")
    # .fai
    subprocess.run([sys.executable, "-c", f"""
import sys; sys.path.insert(0, {ROOT!r})
from tools.make_golden_mbe import write_fai
write_fai({os.path.join(OUT, 'ref.fa')!r})
"""], check=True)
    with open(os.path.join(OUT, "regions.bed"), "w") as f:
        f.write("ctg0\t10\t100\nctg1\t0\t500\nNA\t0\t0\nctg2\t250\t251\n"
                "ctg2\t400\t300\n")
    subprocess.run(
        [sys.executable, os.path.join(REF, "SelectRegions.py"),
         os.path.join(OUT, "regions.bed"), os.path.join(OUT, "ref.fa"),
         os.path.join(OUT, "regions.golden.fa")],
        env=env, check=True)

    # --- liftbed.clean fixture ---
    rows = []
    # chr1_100_200 split into two nearby segments on asm1 (merge)
    rows.append(("asm1", 1000, 1200, "chr1_100_200_x", ".", "+"))
    rows.append(("asm1", 1300, 1500, "chr1_100_200_x", ".", "+"))
    # chr1_300_400 clean single
    rows.append(("asm1", 5000, 5400, "chr1_300_400_y", ".", "-"))
    # chr1_500_600 maps to two contigs (drop)
    rows.append(("asm1", 7000, 7100, "chr1_500_600_z", ".", "+"))
    rows.append(("asm2", 100, 200, "chr1_500_600_z", ".", "+"))
    # chr2_10_20 on asm1 (minor chrom for asm1 -> dropped by majority vote)
    rows.append(("asm1", 9000, 9100, "chr2_10_20_w", ".", "+"))
    # far split (drop)
    rows.append(("asm1", 20000, 20100, "chr1_700_800_v", ".", "+"))
    rows.append(("asm1", 40000, 40100, "chr1_700_800_v", ".", "+"))
    # mixed strand merge -> strand 0
    rows.append(("asm1", 50000, 50100, "chr1_900_950_u", ".", "+"))
    rows.append(("asm1", 50100, 50200, "chr1_900_950_u", ".", "-"))
    with open(os.path.join(OUT, "lift.bed"), "w") as f:
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")
    with open(os.path.join(OUT, "lift.clean.golden.bed"), "w") as f:
        subprocess.run(
            [sys.executable, os.path.join(REF, "liftbed.clean.py"),
             os.path.join(OUT, "lift.bed")],
            env=env, check=True, stdout=f)
    print("misc goldens written", file=sys.stderr)


if __name__ == "__main__":
    main()
