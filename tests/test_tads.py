"""TAD model: DI parity vs oracle, gap rules, end-to-end domain recovery."""

import numpy as np
import jax.numpy as jnp
import pytest

from hichap_master_tpu.core import Genome
from hichap_master_tpu.core.contacts import pad_to_bucket
from hichap_master_tpu.io import write_cooler, CoolerReader
from hichap_master_tpu.ops.di import directionality_index, tad_gap_mask
from hichap_master_tpu.models.tads import gap_filter, run_tads


def oracle_di_ttest(M, Gap, w):
    """StructureFind.py:804-839 (ttest branch)."""
    N = M.shape[0]
    DI = []
    gset = set(Gap)
    for j in range(N):
        if j in gset or j < w or j > N - w - 1:
            DI.append(0.0)
            continue
        up = M[j - w : j, j][::-1]
        down = M[j + 1 : j + w + 1, j]
        um, dm = up.mean(), down.mean()
        ud = np.sum((up - um) ** 2 / (up.size * (up.size - 1)))
        dd = np.sum((down - dm) ** 2 / (down.size * (down.size - 1)))
        den = np.sqrt(ud + dd)
        DI.append((dm - um) / den if den != 0 else 0.0)
    return np.array(DI)


def _domain_matrix(rng, n, dsize, strength=4.0):
    """Block-diagonal TAD structure with distance decay."""
    i = np.arange(n)
    d = np.abs(np.subtract.outer(i, i))
    lam = 40.0 / (1 + d) ** 0.8
    block = (i // dsize)
    same = np.equal.outer(block, block)
    lam = lam * np.where(same, strength, 1.0)
    M = rng.poisson(lam).astype(float)
    return np.triu(M) + np.triu(M, 1).T


def test_di_matches_oracle(rng):
    n, w = 140, 6
    M = _domain_matrix(rng, n, 20)
    Gap = np.array([0, 3, n - 1])
    N = pad_to_bucket(n)
    Mp = np.zeros((N, N)); Mp[:n, :n] = M
    gm = np.zeros(N, bool); gm[Gap] = True; gm[n:] = True
    got = np.asarray(directionality_index(
        jnp.asarray(Mp), jnp.asarray(gm), jnp.asarray(n), w, "ttest"))[:n]
    want = oracle_di_ttest(M, Gap, w)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12)


def test_tad_gap_mask_matches_oracle(rng):
    n, lb = 120, 5
    M = _domain_matrix(rng, n, 15)
    M[40:46] = 0; M[:, 40:46] = 0
    N = pad_to_bucket(n)
    Mp = np.zeros((N, N)); Mp[:n, :n] = M
    got = np.asarray(tad_gap_mask(jnp.asarray(Mp), jnp.asarray(n), lb))[:n]
    t = 2 * lb * 0.8
    want = np.zeros(n, bool)
    for i in range(n):
        if lb <= i <= n - 1 - lb:
            want[i] = (M[i - lb : i + lb, i] != 0).sum() < t
        else:
            want[i] = True
    np.testing.assert_array_equal(got, want)


def test_gap_filter_reference_semantics():
    # long run kept, short singleton dropped, endpoints enforced
    gap = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 50, 80, 81, 82, 99])
    out = gap_filter(gap, 100)
    assert out[0] == 0 and out[-1] == 99
    assert 5 in out            # inside the long run
    assert 50 not in out       # singleton dropped (length-0 run quirk)
    assert len(out) >= 2
    assert gap_filter(np.array([7]), 100) == []


def test_run_tads_end_to_end(tmp_path, rng):
    n, res, dsize = 150, 40_000, 15
    M = _domain_matrix(rng, n, dsize, strength=6.0)
    g = Genome({"1": n * res - res // 2})
    path = str(tmp_path / "t.cool")
    write_cooler(path, g, res, {"1": M})
    # balanced fetch needs weights; use unit weights
    r = CoolerReader(path, res)
    r.set_weights(np.ones(r.nbins))

    out = run_tads(path, res, False, str(tmp_path / "TAD"),
                   min_tad=3 * res, max_tad=40 * res, window=6 * res)
    res1 = out["1"]
    assert (tmp_path / "TAD" / "TAD_DI_40K.txt").exists()
    assert (tmp_path / "TAD" / "TAD_Domain_40K.txt").exists()
    ds, de = res1["domains"]
    assert len(ds) >= 3, f"expected several domains, got {len(ds)}"
    # boundaries should align with the true block edges (±2 bins)
    true_edges = np.arange(dsize, n - 1, dsize) * res
    bpos = res1["boundaries"]["boundary"]
    hits = sum(1 for e in true_edges if np.min(np.abs(bpos - e)) <= 2 * res)
    assert hits >= len(true_edges) * 0.5, (
        f"only {hits}/{len(true_edges)} block edges recovered; "
        f"boundaries={bpos}")
