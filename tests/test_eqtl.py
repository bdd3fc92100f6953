"""eQTL core spec tests: known association recovered; FDR behavior."""

import numpy as np

from danbing_tk_tpu.analysis.eqtl import (fdr_bh, map_eqtls, ols_assoc,
                                          residualize, zscore)


def test_ols_assoc_known():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, 200)
    y = 0.5 * x + rng.normal(0, 0.1, 200)
    b, se, p = ols_assoc(y, x)
    assert abs(b - 0.5) < 0.05 and p < 1e-20


def test_residualize_removes_covariate():
    rng = np.random.default_rng(1)
    C = np.column_stack([np.ones(100), rng.normal(0, 1, 100)])
    y = 3 * C[:, 1] + rng.normal(0, 0.1, 100)
    r = residualize(y[:, None], C)[:, 0]
    assert abs(np.corrcoef(r, C[:, 1])[0, 1]) < 1e-8


def test_fdr_bh():
    p = np.array([0.001, 0.01, 0.03, 0.5, 0.9])
    rej, adj = fdr_bh(p, 0.05)
    assert rej[0] and rej[1] and not rej[-1]
    assert np.all(np.diff(adj[np.argsort(p)]) >= -1e-12)


def test_map_eqtls_end_to_end():
    rng = np.random.default_rng(2)
    ns, nloci, ngenes = 150, 10, 6
    dosage = rng.normal(50, 10, (nloci, ns))
    expr = rng.normal(0, 1, (ngenes, ns))
    # gene 2 driven by locus 4
    expr[2] = 0.8 * zscore(dosage)[4] + rng.normal(0, 0.3, ns)
    pairs = {li: list(range(ngenes)) for li in range(nloci)}
    res = map_eqtls(dosage, expr, pairs)
    hit = [r for r in res if r[0] == 2]
    assert hit and hit[0][1] == 4 and hit[0][6]  # correct locus, rejected
    others = [r for r in res if r[0] != 2]
    assert sum(1 for r in others if r[6]) <= 1  # few false positives
