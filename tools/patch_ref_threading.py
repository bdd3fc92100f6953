#!/usr/bin/env python
"""Builds the threading-enabled oracle binary (out-of-tree, /tmp).

At reference HEAD the graph-threading aligner is fully implemented
(isThreadFeasible & co.) but its call sites are commented out
(aQueryFasta_thread.cpp:2072-2088) and the graph is never loaded -- the
README-documented `-gc ... -ae` behavior is therefore dead code.  To create
a behavioral golden for OUR threading implementation we re-enable exactly
those call sites in a scratch copy of the reference (never committed here)
and build `danbing-tk-thread`:

  * load graphDB from <pref>.graph.kmers when -g/-gc/-gcc is given
  * run isThreadFeasible (+ threadCheck under -gcc) per mate
  * counting mode for threading = "aln": canonical k-mers of the aligned
    (error-corrected) k-mer stream that exist in trKmerDB[destLocus]
    (the commented countMode==1 branch)
  * write .aln rows via writeAlignments under -a/-ae

This mirrors the documented v1.3.1 release behavior as closely as HEAD's
sources allow; deviations are inherently unknowable from HEAD (SURVEY §3.1).
"""

import os
import shutil
import subprocess
import sys

SRC = "/tmp/refbuild"
DST = "/tmp/refthread"

THREAD_BLOCK = """
\t\t\tif (threading) {
\t\t\t\tvector<uint64_t> noncakmers0, noncakmers1;
\t\t\t\tvector<uint64_t> akmers0, akmers1;
\t\t\t\tsam.init1(*seq1);
\t\t\t\talned0 = isThreadFeasible(gf, *seq1, noncakmers0, akmers0, thread_cth, correction, sam.r1, trResults[destLocus], log);
\t\t\t\tsam.init2(*seq2);
\t\t\t\talned1 = isThreadFeasible(gf, *seq2, noncakmers1, akmers1, thread_cth, correction, sam.r2, trResults[destLocus], log);
\t\t\t\tif (tc) {
\t\t\t\t\tif (alned0) { threadCheck(gf, *seq1, akmers0, sam.r1, log); }
\t\t\t\t\tif (alned1) { threadCheck(gf, *seq2, akmers1, sam.r2, log); }
\t\t\t\t}
\t\t\t\tif (alned0 or alned1) {
\t\t\t\t\talned = true;
\t\t\t\t\tkmer_aCount_umap& trKmers = trResults[destLocus];
\t\t\t\t\tkmerCount_umap cakmers;
\t\t\t\t\tif (alned0) { noncaVec2CaUmap(akmers0, cakmers, ksize); }
\t\t\t\t\tif (alned1) { noncaVec2CaUmap(akmers1, cakmers, ksize); }
\t\t\t\t\tfor (auto& p : cakmers) {
\t\t\t\t\t\tauto it = trKmers.find(p.first);
\t\t\t\t\t\tif (it != trKmers.end()) { it->second += p.second; }
\t\t\t\t\t}
\t\t\t\t\tnFeasibleReads_ += alned0 + alned1;
\t\t\t\t}
\t\t\t\telse { destLocus = nloci; }
\t\t\t}
"""

ALN_BLOCK = """
\t\t\tif (aln and threading) {
\t\t\t\tif (not simmode) {
\t\t\t\t\tif ((aln_minimal and destLocus != nloci) or (not aln_minimal)) {
\t\t\t\t\t\talnindices.push_back(seqi);
\t\t\t\t\t\tsam.src = srcLocus;
\t\t\t\t\t\tsam.dst = destLocus;
\t\t\t\t\t\tsams.push_back(sam);
\t\t\t\t\t}
\t\t\t\t} else {
\t\t\t\t\tif ((aln_minimal and (srcLocus != nloci or destLocus != nloci)) or (not aln_minimal)) {
\t\t\t\t\t\talnindices.push_back(seqi);
\t\t\t\t\t\tsam.src = srcLocus;
\t\t\t\t\t\tsam.dst = destLocus;
\t\t\t\t\t\tsams.push_back(sam);
\t\t\t\t\t}
\t\t\t\t}
\t\t\t}
"""


def main():
    if os.path.exists(DST):
        shutil.rmtree(DST)
    shutil.copytree(SRC, DST)
    p = os.path.join(DST, "src", "aQueryFasta_thread.cpp")
    src = open(p).read()

    # 1. load graph when threading
    anchor = "\t\treadKmersWithZeroCount(trKmerDB, trFname);"
    assert anchor in src
    src = src.replace(
        anchor,
        anchor + "\n\t\tif (threading) { "
        "readGraphKmers(graphDB, trPrefix+\".graph.kmers\"); }",
        1,
    )

    # 2. run threading per mate (insert after nThreadingReads_ += 2;)
    anchor = "\t\t\tnThreadingReads_ += 2;"
    assert anchor in src
    src = src.replace(anchor, anchor + "\n" + THREAD_BLOCK, 1)

    # 3. feasible counter should not double count in threading mode
    anchor = "\t\t\tif ((threading and alned) or not threading) {\n\t\t\t\t//kmer_aCount_umap &ikmers = ikmerDB[destLocus];\n\t\t\t\tnFeasibleReads_ += 2;"
    assert anchor in src
    src = src.replace(
        anchor,
        "\t\t\tif ((threading and alned) or not threading) {\n"
        "\t\t\t\tif (not threading) { nFeasibleReads_ += 2; }",
        1,
    )

    # 4. aln output (insert before the commented-out original block, still
    # inside the per-pair loop where `sam` is in scope)
    anchor = "\t\t\t//if (aln and threading) {"
    assert anchor in src
    src = src.replace(anchor, ALN_BLOCK + "\n" + anchor, 1)

    open(p, "w").write(src)
    subprocess.run(["make", "-C", DST, "bin/danbing-tk"], check=True)
    shutil.copy(os.path.join(DST, "bin", "danbing-tk"),
                os.path.join(DST, "bin", "danbing-tk-thread"))
    print("built", os.path.join(DST, "bin", "danbing-tk-thread"),
          file=sys.stderr)


if __name__ == "__main__":
    main()
