"""eQTL association core vs the reference eqtl.noPerm.py functions.

The reference module is import-guarded, so its statistical core
(runRegressionZ3: z-score -> per-(TR, gene) OLS -> Bonferroni -> best
TR per gene) runs directly here with the numpy/scipy statsmodels shim
(tests/stubs) and must agree with analysis/eqtl.map_eqtls to fp
precision on the same synthetic matrices.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF_SCRIPT = "/root/reference/script/eqtl.noPerm.py"
STUBS = os.path.join(os.path.dirname(__file__), "stubs")


def _load_ref():
    sys.path.insert(0, STUBS)
    try:
        spec = importlib.util.spec_from_file_location("ref_eqtl",
                                                      REF_SCRIPT)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove(STUBS)


@pytest.mark.skipif(not os.path.exists(REF_SCRIPT),
                    reason="reference checkout absent")
def test_map_eqtls_vs_reference_core():
    ref = _load_ref()
    rng = np.random.default_rng(17)
    nloci, ngenes, ns = 12, 8, 60
    dosage = rng.normal(50, 12, (nloci, ns))
    expr = rng.normal(0, 1, (ngenes, ns))
    # plant real associations for a few (locus, gene) pairs
    expr[2] += 0.08 * dosage[5]
    expr[6] -= 0.1 * dosage[1]
    pairs = {li: sorted(rng.choice(ngenes, size=int(rng.integers(1, 4)),
                                   replace=False).tolist())
             for li in range(nloci)}
    genei2n = {}
    for li, gs in pairs.items():
        for g in gs:
            genei2n[g] = genei2n.get(g, 0) + 1

    tiseGeneTR, stats = ref.runRegressionZ3(expr, dosage, pairs, genei2n)
    want = {int(g): (stats[i][0], stats[i][1], stats[i][2], int(tr))
            for i, (g, tr) in enumerate(tiseGeneTR)}

    from danbing_tk_tpu.analysis.eqtl import map_eqtls

    got_rows = map_eqtls(dosage, expr, pairs)
    got = {g: (p, b, se, tr) for g, tr, b, se, p, _, _ in got_rows}

    assert set(got) == set(want)
    assert want, "no associations — test has no teeth"
    for g in want:
        wp, wb, wse, wtr = want[g]
        gp, gb, gse, gtr = got[g]
        assert gtr == wtr, (g, gtr, wtr)
        # our map_eqtls clips Bonferroni p at 1.0 (a documented choice);
        # compare on the unclipped scale where the reference exceeds 1
        np.testing.assert_allclose(min(gp, 1.0), min(wp, 1.0),
                                   rtol=1e-9)
        np.testing.assert_allclose(gb, wb, rtol=1e-9)
        np.testing.assert_allclose(gse, wse, rtol=1e-9)
