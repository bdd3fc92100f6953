import numpy as np


def fdrcorrection(pvals, alpha=0.05, method="indep", is_sorted=False):
    """Benjamini-Hochberg (statsmodels-compatible signature subset)."""
    p = np.asarray(pvals, dtype=float)
    n = len(p)
    order = np.argsort(p)
    ranked = p[order] * n / np.arange(1, n + 1)
    adj = np.minimum.accumulate(ranked[::-1])[::-1]
    adj = np.minimum(adj, 1.0)
    out = np.empty(n)
    out[order] = adj
    return out <= alpha, out
