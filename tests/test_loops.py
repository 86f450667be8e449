"""Loop model: stencil parity vs brute-force oracle, stats parity, e2e."""

import numpy as np
import jax.numpy as jnp
import pytest

from hichap_master_tpu.ops.loops_kernel import (
    band_limit,
    donut_sums,
    lowerleft_sums,
    oracle_region_sums,
    sat,
)
from hichap_master_tpu.ops.stats import bh_fdr, isotonic_fit, poisson_sf


def test_donut_and_lowerleft_match_bruteforce(rng):
    N, w, pw = 60, 5, 2
    M = rng.poisson(2.0, (N, N)).astype(float)
    S = sat(jnp.asarray(M))
    K = np.asarray(donut_sums(S, w, pw))
    Y = np.asarray(lowerleft_sums(S, w, pw))
    for x, y in [(10, 20), (0, 3), (55, 59), (30, 30), (2, 58)]:
        ok, oy = oracle_region_sums(M, x, y, w, pw)
        assert K[x, y] == pytest.approx(ok), (x, y)
        assert Y[x, y] == pytest.approx(oy), (x, y)


def test_band_limit(rng):
    N = 16
    M = rng.random((N, N))
    B = np.asarray(band_limit(jnp.asarray(M), 2, 5))
    i, j = np.indices((N, N))
    d = j - i
    want = np.where((d >= 2) & (d < 5), M, 0)
    np.testing.assert_allclose(B, want)


def test_bh_fdr_matches_reference_algorithm(rng):
    p = rng.random(200) ** 2
    q = bh_fdr(p)
    # classic BH: q_i = min over j>=rank(i) of p_j * n / j
    n = len(p)
    order = np.argsort(p)
    want = np.empty(n)
    run = 1.0
    for k in range(n - 1, -1, -1):
        run = min(run, p[order[k]] * n / (k + 1))
        want[order[k]] = run
    np.testing.assert_allclose(q, want, rtol=1e-12)
    try:
        from scipy.stats import false_discovery_control
        np.testing.assert_allclose(q, false_discovery_control(p), rtol=1e-10)
    except ImportError:
        pass


def test_poisson_sf_matches_scipy(rng):
    from scipy.stats import poisson
    k = rng.integers(0, 30, 100).astype(float)
    mu = rng.random(100) * 20 + 0.1
    np.testing.assert_allclose(poisson_sf(k, mu), poisson.sf(k, mu),
                               rtol=1e-10, atol=1e-300)
    # non-integer observed (allelic corrected counts) floors like scipy
    np.testing.assert_allclose(poisson_sf(k + 0.7, mu), poisson.sf(k + 0.7, mu),
                               rtol=1e-10, atol=1e-300)


def test_isotonic_matches_sklearn(rng):
    from sklearn.isotonic import IsotonicRegression
    x = np.arange(3, 60, dtype=float)
    y = 50 / x + rng.normal(0, 0.3, x.size)
    ours = isotonic_fit(x, y, increasing="auto")
    ref = IsotonicRegression(increasing="auto").fit(x, y)
    xq = np.linspace(3, 59, 100)
    np.testing.assert_allclose(ours.predict(xq), ref.predict(xq), rtol=1e-9)


def _loop_matrix(rng, n, loops, res_strength=40.0):
    i = np.arange(n)
    d = np.abs(np.subtract.outer(i, i)).astype(float)
    lam = res_strength / (1 + d) ** 1.0 + 0.2
    for (x, y) in loops:
        lam[max(x - 1, 0): x + 2, max(y - 1, 0): y + 2] *= 3
        lam[x, y] *= 6
    M = rng.poisson(lam).astype(float)
    return np.triu(M) + np.triu(M, 1).T


@pytest.mark.slow
def test_run_loops_end_to_end(tmp_path, rng):
    from hichap_master_tpu.core import Genome
    from hichap_master_tpu.io import CoolerReader, write_cooler
    from hichap_master_tpu.models.loops import run_loops

    n, res = 160, 40_000
    true_loops = [(30, 55), (80, 110), (20, 42)]
    M = _loop_matrix(rng, n, true_loops)
    g = Genome({"1": n * res - res // 2})
    path = str(tmp_path / "l.cool")
    write_cooler(path, g, res, {"1": M})
    r = CoolerReader(path, res)
    r.set_weights(np.ones(r.nbins))

    final = run_loops(path, res, False, str(tmp_path / "Loops"),
                      loop_strength=4)
    # candidate file exists and has the right header
    raw = tmp_path / "Loops" / "Loops_Loops_40K.txt"
    assert raw.exists()
    header = raw.read_text().splitlines()[0].split("\t")
    assert header == ["chromLabel", "loc_1", "loc_2", "IF", "D-Enrichment",
                      "D-pvalue", "D-qvalue", "LL-Enrichment", "LL-pvalue",
                      "LL-qvalue"]
    rows = [l.split("\t") for l in raw.read_text().splitlines()[1:]]
    found = {(int(r_[1]) // res, int(r_[2]) // res) for r_ in rows}
    hits = sum(1 for t in true_loops
               if any(abs(t[0] - f[0]) <= 1 and abs(t[1] - f[1]) <= 1
                      for f in found))
    assert hits >= 2, f"recovered {hits}/3 planted loops; found={found}"
    # clustered output exists
    import os
    assert os.path.exists(final)
    lines = open(final).read().splitlines()
    assert lines[0].startswith("chr\tstart\tend")
