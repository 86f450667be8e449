"""The vectorized/jitted loop-stage statistics must reproduce the
reference's per-chunk host loops exactly (host path) or within f32
tolerance (device path)."""

import numpy as np
import pytest

from hichap_master_tpu.models.loops import (_allelic_prefilter,
                                            _gap_neighborhood_keep)
from hichap_master_tpu.ops.stats import lambda_chunks
from hichap_master_tpu.ops.stats import (bh_fdr, poisson_bh_chunked,
                                         poisson_sf)


def _loop_reference_poisson_bh(o, e):
    """The round-1 per-λ-chunk host loop, kept as the oracle."""
    pv = np.ones(e.size)
    qv = np.ones(e.size)
    for lv, rv, idx in lambda_chunks(e):
        if idx.size > 0:
            chunk_p = poisson_sf(o[idx], rv)
            pv[idx] = chunk_p
            qv[idx] = bh_fdr(chunk_p)
    return pv, qv


@pytest.fixture
def oe(rng):
    n = 5000
    e = rng.gamma(2.0, 8.0, n)
    e[:5] = [0.0, 1.0, 2 ** (1 / 3), 0.5, 2 ** (5 / 3)]  # edges + chunk 0
    o = np.floor(e * rng.uniform(0.5, 3.0, n))
    return o, e


def test_poisson_bh_chunked_matches_loop(oe):
    o, e = oe
    pv_l, qv_l = _loop_reference_poisson_bh(o, e)
    pv_v, qv_v = poisson_bh_chunked(o, e)
    np.testing.assert_allclose(pv_v, pv_l, rtol=1e-12, atol=0)
    np.testing.assert_allclose(qv_v, qv_l, rtol=1e-12, atol=0)


def test_poisson_bh_chunked_empty_and_zero():
    pv, qv = poisson_bh_chunked(np.array([]), np.array([]))
    assert pv.size == 0 and qv.size == 0
    pv, qv = poisson_bh_chunked(np.zeros(3), np.zeros(3))
    assert (pv == 1).all() and (qv == 1).all()


def test_poisson_bh_device_matches_host(oe):
    import jax.numpy as jnp

    from hichap_master_tpu.ops.stats_jax import poisson_bh_chunked_jax

    o, e = oe
    pv_h, qv_h = poisson_bh_chunked(o, e)
    pv_d, qv_d = poisson_bh_chunked_jax(
        jnp.asarray(o, jnp.float32), jnp.asarray(e, jnp.float32),
        jnp.ones(o.size, bool))
    pv_d, qv_d = np.asarray(pv_d, float), np.asarray(qv_d, float)
    np.testing.assert_allclose(pv_d, pv_h, rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(qv_d, qv_h, rtol=5e-4, atol=1e-6)
    # invalid pixels stay at 1 and don't perturb their chunk's BH
    valid = np.ones(o.size, bool)
    valid[::7] = False
    pv_m, qv_m = poisson_bh_chunked_jax(
        jnp.asarray(o, jnp.float32), jnp.asarray(e, jnp.float32),
        jnp.asarray(valid))
    assert (np.asarray(pv_m)[~valid] == 1).all()
    assert (np.asarray(qv_m)[~valid] == 1).all()
    pv_sub, qv_sub = poisson_bh_chunked(o[valid], e[valid])
    np.testing.assert_allclose(np.asarray(pv_m, float)[valid], pv_sub,
                               rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(qv_m, float)[valid], qv_sub,
                               rtol=5e-4, atol=1e-6)


def test_gap_neighborhood_keep_matches_sets(rng):
    N = 400
    gaps = set(rng.choice(N, 25, replace=False).tolist())
    pxi = rng.integers(0, N, 300)
    pyi = rng.integers(0, N, 300)
    keep = _gap_neighborhood_keep(pxi, pyi, N, gaps)
    for k in range(pxi.size):
        lo = pxi[k] - 5 if pxi[k] > 5 else 0
        hi = pxi[k] + 5 if pxi[k] + 5 < N else N - 1
        c1 = set(range(lo, hi))
        lo = pyi[k] - 5 if pyi[k] > 5 else 0
        hi = pyi[k] + 5 if pyi[k] + 5 < N else N - 1
        c2 = set(range(lo, hi))
        assert keep[k] == (not (c1 | c2) & gaps)


def test_allelic_prefilter_matches_dict_oracle(rng):
    N = 120
    nnz = 900
    rows = rng.integers(0, N, nnz)
    cols = rng.integers(0, N, nnz)
    keep_ut = rows <= cols
    rows, cols = rows[keep_ut], cols[keep_ut]
    # dedup (cooler COO is unique)
    key = rows * N + cols
    _, uniq = np.unique(key, return_index=True)
    rows, cols = rows[uniq], cols[uniq]
    vals = rng.poisson(3.0, rows.size).astype(float)  # some zeros

    xi = rng.integers(0, N, 500)
    yi = rng.integers(0, N, 500)
    gap = rng.choice(N, 10, replace=False)

    keep = _allelic_prefilter(xi, yi, N, gap, rows, cols, vals)

    lut = {}
    for r, c, v in zip(rows, cols, vals):
        lut[(int(r), int(c))] = v
        lut[(int(c), int(r))] = v
    gap_set = set(gap.tolist())
    for k in range(xi.size):
        xk, yk = int(xi[k]), int(yi[k])
        if xk in gap_set and yk in gap_set:
            expect = False
        else:
            left = lut.get((xk - 1, yk), 0) if xk - 1 >= 0 else 1
            right = lut.get((xk + 1, yk), 0) if xk + 1 < N else 1
            top = lut.get((xk, yk + 1), 0) if yk + 1 < N else 1
            bottom = lut.get((xk, yk - 1), 0) if yk - 1 >= 0 else 1
            expect = left * right * top * bottom != 0
        assert keep[k] == expect, (k, xk, yk)
