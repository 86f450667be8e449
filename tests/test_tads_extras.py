"""TAD extras: 5/6-state priors, chitest DI, boundary-call patterns."""

import numpy as np
import jax.numpy as jnp
import pytest

from hichap_master_tpu.core.contacts import pad_to_bucket
from hichap_master_tpu.models.tads import boundary_call, init_parameters
from hichap_master_tpu.ops.di import directionality_index


def test_init_parameters_shapes_and_zeros():
    for s in (3, 5, 6):
        m = init_parameters(s)
        assert m.A.shape == (s, s)
        np.testing.assert_allclose(m.A.sum(1), 1.0, atol=1e-9)
        assert m.means.shape == (s, 3)
        assert (m.varis > 0).all()
    m6 = init_parameters(6)
    np.testing.assert_allclose(m6.varis[5], 1e-4)  # gap state tight variance
    m5 = init_parameters(5)
    assert m5.A[0, 1] == 1.0 and m5.A[0, 0] == 0.0
    with pytest.raises(ValueError):
        init_parameters(4)


def oracle_di_chitest(M, Gap, w):
    N = M.shape[0]
    out = []
    gset = set(Gap)
    for j in range(N):
        if j in gset or j < w or j > N - w - 1:
            out.append(0.0)
            continue
        up = M[j - w : j, j][::-1]
        down = M[j + 1 : j + w + 1, j]
        us, ds = up.sum(), down.sum()
        e = (us + ds) / 2.0
        if us != ds and e != 0:
            out.append(np.sign(ds - us) * ((us - e) ** 2 / e
                                           + (ds - e) ** 2 / e))
        else:
            out.append(0.0)
    return np.array(out)


def test_di_chitest_matches_oracle(rng):
    n, w = 100, 5
    M = rng.poisson(4.0, (n, n)).astype(float)
    M = np.triu(M) + np.triu(M, 1).T
    Gap = np.array([0, n - 1])
    N = pad_to_bucket(n)
    Mp = np.zeros((N, N)); Mp[:n, :n] = M
    gm = np.zeros(N, bool); gm[Gap] = True; gm[n:] = True
    got = np.asarray(directionality_index(
        jnp.asarray(Mp), jnp.asarray(gm), jnp.asarray(n), w, "chitest"))[:n]
    want = oracle_di_chitest(M, Gap, w)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12)


def test_boundary_call_patterns_3state():
    # raw state string: '5' padding, then a 2->0 transition at the pattern
    res = 40_000
    di_len = 20
    # segment [2, 18) decoded as 2,2,2,0,0,1,1,2,2,2,1,0,0,0,2,2
    path = np.array([2, 2, 2, 0, 0, 1, 1, 2, 2, 2, 1, 0, 0, 0, 2, 2])
    paths = {(2, 18): (path, -12.3)}
    out = boundary_call(paths, di_len, 3, res)
    # raw string "55222001122210002255": '220' at i=3 → bin 5 (also '200'
    # at i=4 → 5), '2221' at i=9 → 12, '1000' at i=12 → 13
    b_bins = set((out["boundary"] // res).tolist())
    assert b_bins == {5, 12, 13}
    assert all(s == "both" for s in out["state"])


def test_boundary_call_patterns_5state():
    res = 40_000
    path = np.array([2, 3, 4, 0, 1, 1, 2])
    paths = {(0, 7): (path, -1.0)}
    out = boundary_call(paths, 7, 5, res)
    b_bins = set((out["boundary"] // res).tolist())
    assert 3 in b_bins          # '40' → i+1
