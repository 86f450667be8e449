"""pcaller_multi (one vmapped escalation dispatch per size bucket) must
reproduce pcaller_chrom_coo exactly per chromosome."""

import numpy as np
import pytest

from hichap_master_tpu.models.loops import (pcaller_chrom_coo, pcaller_multi,
                                            peaks_parameters)

RES = 10_000


def _chrom(rng, n, band, loops=6):
    d = np.arange(band)
    lam = 12.0 / (d + 1.0) ** 0.8
    counts = rng.poisson(np.broadcast_to(lam, (n, band))).astype(np.float64)
    for _ in range(loops):
        x = int(rng.integers(5, n - band - 5))
        e = int(rng.integers(20, band - 20))
        counts[x, e] = counts[x, e] * 10 + 80
    rows, es = np.nonzero(counts)
    cols = rows + es
    keep = cols < n
    return rows[keep].astype(np.int64), cols[keep].astype(np.int64), \
        counts[rows, es][keep]


@pytest.fixture
def params():
    return peaks_parameters(RES)


@pytest.mark.slow
def test_multi_matches_single(params):
    rng = np.random.default_rng(3)
    band = params["maxapart"] // RES + params["maxww"] + 1
    # two same-bucket chromosomes + one smaller bucket
    sizes = {"1": 512, "2": 512, "3": 384}
    inputs = {}
    for c, n in sizes.items():
        rows, cols, vals = _chrom(rng, n, min(band, n - 8))
        inputs[c] = (rows, cols, vals, np.ones(n), n)

    multi = pcaller_multi(inputs, RES, params)
    assert set(multi) == set(sizes)
    any_loops = 0
    for c, (rows, cols, vals, wt, n) in inputs.items():
        donuts, ll = pcaller_chrom_coo(rows, cols, vals, wt, n, RES, params)
        m_donuts, m_ll = multi[c]
        assert set(m_donuts) == set(donuts), c
        assert set(m_ll) == set(ll), c
        for pos in donuts:
            np.testing.assert_allclose(m_donuts[pos], donuts[pos],
                                       rtol=1e-6)
            np.testing.assert_allclose(m_ll[pos], ll[pos], rtol=1e-6)
        any_loops += len(donuts)
    assert any_loops > 0, "synthetic loops should produce candidates"


@pytest.mark.slow
def test_multi_single_group_is_one_dispatch(params):
    # same sizes → one group; sanity that grouping keys collapse
    rng = np.random.default_rng(5)
    band = params["maxapart"] // RES + params["maxww"] + 1
    inputs = {}
    for c in ("1", "2", "3"):
        rows, cols, vals = _chrom(rng, 512, min(band, 504))
        inputs[c] = (rows, cols, vals, np.ones(512), 512)
    out = pcaller_multi(inputs, RES, params)
    assert set(out) == {"1", "2", "3"}
