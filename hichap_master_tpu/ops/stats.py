"""Statistical primitives: BH-FDR, Poisson tails, isotonic regression (PAVA).

statsmodels and sklearn.isotonic are reference dependencies
(HiCHap/StructureFind.py:12-16); both are re-implemented here to keep the
framework self-contained.  ``bh_fdr`` matches
``statsmodels...multipletests(method='fdr_bh')`` corrected p-values;
``isotonic_fit``/``isotonic_predict`` match
``sklearn.isotonic.IsotonicRegression(increasing='auto')`` with linear
interpolation and edge clipping.
"""

from __future__ import annotations

import numpy as np
from scipy.special import gammainc, gammaincc


def bh_fdr(pvalues: np.ndarray) -> np.ndarray:
    """Benjamini-Hochberg corrected p-values (monotone, clipped to 1)."""
    p = np.asarray(pvalues, dtype=float)
    n = p.size
    if n == 0:
        return p.copy()
    order = np.argsort(p)
    ranked = p[order] * n / np.arange(1, n + 1)
    ranked = np.minimum.accumulate(ranked[::-1])[::-1]
    ranked = np.clip(ranked, 0, 1)
    out = np.empty(n)
    out[order] = ranked
    return out


def poisson_sf(k: np.ndarray, mu: np.ndarray) -> np.ndarray:
    """P(X > k) for X ~ Poisson(mu), k floored like scipy's discrete cdf.

    ``1 - poisson.cdf(k, mu) = gammainc(floor(k)+1, mu)`` (regularized lower
    incomplete gamma)."""
    k = np.floor(np.asarray(k, dtype=float))
    mu = np.asarray(mu, dtype=float)
    return gammainc(k + 1.0, mu)


def poisson_cdf(k: np.ndarray, mu: np.ndarray) -> np.ndarray:
    k = np.floor(np.asarray(k, dtype=float))
    return gammaincc(k + 1.0, np.asarray(mu, dtype=float))


def lambda_chunk_edges(numbin: int) -> np.ndarray:
    """λ-chunk boundaries (StructureFind.py:1619-1632): chunk 0 covers
    (0, 1) and chunk c ≥ 1 covers (2^((c-1)/3), 2^(c/3)), both open."""
    return np.concatenate([[0.0],
                           np.power(2.0, np.arange(numbin) / 3.0)])


def poisson_bh_chunked(o: np.ndarray, e: np.ndarray):
    """λ-chunked Poisson upper-tail p-values + per-chunk BH, vectorized.

    Single-pass replacement for the reference's per-chunk loop
    (StructureFind.py:1869-1902): each pixel's chunk is found by digitize
    against the 2^(k/3) edge grid, the Poisson survival P(X > o) is taken
    at the chunk's UPPER edge (the reference's ``1 - poisson(rv).cdf(O)``),
    and BH runs per chunk via one global (chunk, p) lexsort with a
    segmented reverse running-min.  Pixels on a chunk edge or with e ≤ 0
    belong to no chunk and keep pv = qv = 1, exactly like the reference's
    strict ``(E > lv) & (E < rv)`` masks.
    """
    o = np.asarray(o, float)
    e = np.asarray(e, float)
    pv = np.ones(e.size)
    qv = np.ones(e.size)
    if e.size == 0 or e.max() <= 0:
        return pv, qv
    numbin = int(np.ceil(np.log(e.max()) / np.log(2) * 3 + 1))
    if numbin < 1:
        # e.max() <= 2^(-1/3): the reference's lambda_chunks is empty —
        # every pixel keeps pv = qv = 1 (a negative numbin previously
        # indexed edges[-2] and crashed)
        return pv, qv
    edges = lambda_chunk_edges(numbin)          # len numbin + 1
    c = np.digitize(e, edges) - 1               # in [-1, numbin]
    ok = (c >= 0) & (c < numbin)
    ok &= e != edges[np.clip(c, 0, numbin)]     # open lower bound
    if not ok.any():
        return pv, qv
    rv = edges[np.clip(c, 0, numbin - 1) + 1]
    p_ok = poisson_sf(o[ok], rv[ok])
    pv[ok] = p_ok

    cidx = c[ok]
    order = np.lexsort((p_ok, cidx))
    ps, cs = p_ok[order], cidx[order]
    seg_start = np.flatnonzero(
        np.concatenate([[True], cs[1:] != cs[:-1]]))
    seg_end = np.concatenate([seg_start[1:], [cs.size]])
    q_sorted = np.empty_like(ps)
    for s, t in zip(seg_start, seg_end):
        m = t - s
        r = ps[s:t] * m / np.arange(1, m + 1)
        q_sorted[s:t] = np.clip(np.minimum.accumulate(r[::-1])[::-1], 0, 1)
    q_ok = np.empty_like(ps)
    q_ok[order] = q_sorted
    qv[ok] = q_ok
    return pv, qv


def _pava(y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Pool-adjacent-violators for a nondecreasing fit."""
    n = len(y)
    sol = y.astype(float).copy()
    wgt = w.astype(float).copy()
    # block representation
    means = list(sol)
    weights = list(wgt)
    counts = [1] * n
    i = 0
    while i < len(means) - 1:
        if means[i] > means[i + 1] + 1e-15:
            tot = weights[i] + weights[i + 1]
            m = (means[i] * weights[i] + means[i + 1] * weights[i + 1]) / tot
            means[i] = m
            weights[i] = tot
            counts[i] += counts[i + 1]
            del means[i + 1], weights[i + 1], counts[i + 1]
            if i > 0:
                i -= 1
        else:
            i += 1
    out = np.empty(n)
    pos = 0
    for m, c in zip(means, counts):
        out[pos : pos + c] = m
        pos += c
    return out


def _avg_rank(a: np.ndarray) -> np.ndarray:
    """Average ranks with ties sharing their group mean (spearmanr)."""
    _, inv, counts = np.unique(a, return_inverse=True, return_counts=True)
    cum = np.cumsum(counts)
    avg = cum - (counts - 1) / 2.0
    return avg[inv]


class IsotonicFit:
    """Monotone regression with sklearn-compatible predict()."""

    def __init__(self, x: np.ndarray, y_fit: np.ndarray):
        self.x = np.asarray(x, float)
        self.y = np.asarray(y_fit, float)

    def predict(self, xq: np.ndarray) -> np.ndarray:
        xq = np.clip(np.asarray(xq, float), self.x[0], self.x[-1])
        return np.interp(xq, self.x, self.y)


def isotonic_fit(x: np.ndarray, y: np.ndarray,
                 increasing: str | bool = "auto") -> IsotonicFit:
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    order = np.argsort(x)
    xs, ys = x[order], y[order]
    w = np.ones_like(ys)
    if increasing == "auto":
        # sklearn's check_increasing: sign of Spearman correlation with
        # AVERAGE ranks for ties (scipy.spearmanr) — positional
        # tie-breaking correlated a tied zero tail with x and flipped
        # sparse decay curves to "increasing", flattening the fit
        rho = np.corrcoef(_avg_rank(xs), _avg_rank(ys))[0, 1]
        inc = bool(rho >= 0)
    else:
        inc = bool(increasing)
    # sklearn's _make_unique: duplicate x mean-aggregate (weighted)
    # BEFORE PAVA — interp over a non-strictly-increasing grid gave
    # non-sklearn fits for tied x (direction check above runs on the
    # raw arrays, matching sklearn's order of operations)
    ux, inv, counts = np.unique(xs, return_inverse=True,
                                return_counts=True)
    if len(ux) != len(xs):
        ys = np.bincount(inv, weights=ys) / counts
        xs = ux
        w = counts.astype(float)
    if inc:
        fit = _pava(ys, w)
    else:
        fit = -_pava(-ys, w)
    return IsotonicFit(xs, fit)


def ttest_rel(a: np.ndarray, b: np.ndarray):
    """Paired t-test, scipy.stats.ttest_rel parity (two-sided)."""
    from scipy import stats as _st

    return _st.ttest_rel(a, b)


def norm_sf(x):
    from scipy import stats as _st

    return _st.norm.sf(x)


def lambda_chunks(E: np.ndarray):
    """Power-of-2^(1/3) λ bins (StructureFind.py:1619-1632).

    Kept as the reference-shaped oracle for ``poisson_bh_chunked``
    (the vectorized production path); no production code calls it."""
    if E.size == 0 or E.max() <= 0:
        return []
    numbin = int(np.ceil(np.log(E.max()) / np.log(2) * 3 + 1))
    pool = []
    for i in range(1, numbin + 1):
        if i == 1:
            lv, rv = 0.0, 1.0
        else:
            lv = np.power(2, (i - 2) / 3.0)
            rv = np.power(2, (i - 1) / 3.0)
        idx = np.where((E > lv) & (E < rv))[0]
        pool.append((lv, rv, idx))
    return pool
