"""Minimal numpy-backed statsmodels shim for executing reference scripts
as oracles (statsmodels is absent in this environment).  Implements only
what script/vntrutils.py touches: sm.OLS(y, x).fit() -> .params/.resid/
.rsquared (uncentered, no-constant convention) and sm.add_constant.
Backed by np.linalg.lstsq — an implementation INDEPENDENT of the
repo's closed-form OLS, so oracle comparisons are non-circular."""
