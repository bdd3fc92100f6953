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


class OLS:
    def __init__(self, endog, exog):
        self._y, self._x = endog, exog

    def fit(self):
        return _Fit(self._y, self._x)


def add_constant(x):
    x = np.asarray(x, dtype=float)
    return np.column_stack([np.ones(len(x)), x])
