import numpy as np


class _Fit:
    def __init__(self, y, x):
        y = np.asarray(y, dtype=float)
        x = np.asarray(x, dtype=float)
        x2 = x if x.ndim == 2 else x[:, None]
        params, *_ = np.linalg.lstsq(x2, y, rcond=None)
        self.params = np.ravel(params)
        self.resid = y - x2 @ params        # keeps y's shape (2-D in)
        ssr = float((self.resid ** 2).sum())
        has_const = x2.shape[1] > 1 and np.allclose(x2[:, 0], 1.0)
        if has_const:
            tss = float(((y - y.mean()) ** 2).sum())
        else:
            tss = float((y ** 2).sum())
        self.rsquared = 1.0 - ssr / tss if tss else 0.0
        # slope inference (t-test), as eqtl.noPerm uses .bse/.pvalues
        from scipy import stats as _st
        n, k = x2.shape
        dof = max(n - k, 1)
        sigma2 = ssr / dof
        xtx_inv = np.linalg.inv(x2.T @ x2)
        self.bse = np.sqrt(np.diag(sigma2 * xtx_inv))
        with np.errstate(divide="ignore", invalid="ignore"):
            t = self.params / self.bse
        self.pvalues = 2 * _st.t.sf(np.abs(t), dof)


class OLS:
    def __init__(self, endog, exog):
        self._y, self._x = endog, exog

    def fit(self):
        return _Fit(self._y, self._x)


def add_constant(x, prepend=True):
    x = np.asarray(x, dtype=float)
    cols = [np.ones(len(x)), x] if prepend else [x, np.ones(len(x))]
    return np.column_stack(cols)
