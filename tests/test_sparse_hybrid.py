"""Hybrid (tiles + scattered COO) genome-wide layout — the representation
for REAL genome-wide matrices whose inter-chromosomal pixels would explode
the pure tile layout (ops/sparse_hybrid.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hichap_master_tpu.ops.balance import ice_balance
from hichap_master_tpu.ops.sparse import blocks_to_dense
from hichap_master_tpu.ops.sparse_hybrid import (HybridGW, _segment_sums,
                                                 hybrid_from_coo,
                                                 ice_balance_hybrid)


def _mixed_matrix(rng, n, band=40, n_scatter=800):
    """Banded intra-like mass + scattered far-field singles."""
    i = np.arange(n)
    d = np.abs(np.subtract.outer(i, i))
    M = (rng.poisson(50.0 / (d + 1.0)) * (d < band)).astype(np.float64)
    r = rng.integers(0, n, n_scatter)
    c = rng.integers(0, n, n_scatter)
    np.add.at(M, (r, c), 1.0)
    M = np.triu(M) + np.triu(M, 1).T
    return M


def _upper_coo(M):
    iu = np.triu_indices(M.shape[0])
    v = M[iu]
    nz = v != 0
    return iu[0][nz], iu[1][nz], v[nz]


@pytest.mark.slow
def test_segment_sums_match_float64(rng):
    # adversarial: big positive prefix magnitude, small per-row sums —
    # a plain f32 cumsum difference loses these to cancellation
    P, N = 200_000, 512
    vals = rng.uniform(0.5, 1.5, P).astype(np.float32) * 100.0
    rows = np.sort(rng.integers(0, N, P))
    bounds = np.searchsorted(rows, np.arange(N + 1)).astype(np.int32)
    got = np.asarray(_segment_sums(jnp.asarray(vals), jnp.asarray(bounds)))
    want = np.zeros(N)
    np.add.at(want, rows, vals.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # sanity: the naive f32 prefix diff would NOT meet this tolerance
    cum = np.concatenate([[0], np.cumsum(vals, dtype=np.float32)])
    naive = cum[bounds[1:]] - cum[bounds[:-1]]
    assert np.abs(naive - want).max() > np.abs(got - want).max() * 10


def test_hybrid_split_reconstructs_matrix(rng):
    n = 300
    M = _mixed_matrix(rng, n)
    h = hybrid_from_coo(*_upper_coo(M), n, T=64, min_tile_occ=64,
                        ignore_diags=0)
    dense_part = blocks_to_dense(h.bm)
    # rebuild scattered: directed list covers both orientations
    sc = np.zeros((h.bm.R * h.bm.T, h.bm.R * h.bm.T))
    rows = np.repeat(np.arange(h.bounds.size - 1),
                     np.diff(h.bounds.astype(np.int64)))
    np.add.at(sc, (rows, h.sc_cols[: rows.size]), h.sc_vals[: rows.size])
    got = dense_part + sc[:n, :n]
    np.testing.assert_allclose(got, M)
    assert h.bm.K > 1 and h.sc_nnz.sum() > 0, "split degenerate"


@pytest.mark.parametrize("min_tile_occ", [1, 64, 10**9])
def test_hybrid_ice_matches_dense(rng, min_tile_occ):
    n = 300
    M = _mixed_matrix(rng, n)
    w_d, st_d = ice_balance(jnp.asarray(M, jnp.float32), jnp.asarray(n),
                            max_iters=60, tol=0.0)
    h = hybrid_from_coo(*_upper_coo(M), n, T=64, min_tile_occ=min_tile_occ)
    w_h, st_h = ice_balance_hybrid(h, max_iters=60, tol=0.0)
    w_d = np.asarray(w_d)[:n]
    w_h = np.asarray(w_h)
    np.testing.assert_array_equal(np.isnan(w_d), np.isnan(w_h))
    m = ~np.isnan(w_d)
    assert m.any()
    np.testing.assert_allclose(w_h[m], w_d[m], rtol=2e-4)


def test_hybrid_ice_scan_reduce_matches_onehot(rng):
    n = 300
    M = _mixed_matrix(rng, n)
    h = hybrid_from_coo(*_upper_coo(M), n, T=64, min_tile_occ=64)
    w_o, _ = ice_balance_hybrid(h, max_iters=60, tol=0.0, reduce="onehot")
    w_s, _ = ice_balance_hybrid(h, max_iters=60, tol=0.0, reduce="scan")
    w_o, w_s = np.asarray(w_o), np.asarray(w_s)
    np.testing.assert_array_equal(np.isnan(w_o), np.isnan(w_s))
    m = ~np.isnan(w_o)
    np.testing.assert_allclose(w_s[m], w_o[m], rtol=1e-5)


def test_hybrid_uint16_storage_matches_f32(rng):
    # integer counts fitting uint16 are STORED uint16 (half the host->
    # device wire) and cast to f32 on device; results must be identical
    n = 300
    M = _mixed_matrix(rng, n)
    r, c, v = _upper_coo(M)
    # uint16 storage requires assume_unique: duplicate pixels ACCUMULATE
    # and a u16 sum could wrap (review find) — without the flag integer
    # counts stay in float storage
    h_dup = hybrid_from_coo(r, c, v.astype(np.int32), n, T=64,
                            min_tile_occ=64)
    assert h_dup.bm.tiles.dtype == np.float32
    h16 = hybrid_from_coo(r, c, v.astype(np.int32), n, T=64, min_tile_occ=64,
                          assume_unique=True)
    assert h16.bm.tiles.dtype == np.uint16
    assert h16.sc_vals.dtype == np.uint16
    h32 = hybrid_from_coo(r, c, v, n, T=64, min_tile_occ=64,
                          assume_unique=True)
    assert h32.bm.tiles.dtype == np.float32
    w16, _ = ice_balance_hybrid(h16, max_iters=60, tol=0.0)
    w32, _ = ice_balance_hybrid(h32, max_iters=60, tol=0.0)
    np.testing.assert_array_equal(np.asarray(w16), np.asarray(w32))
    # counts above the uint16 range must stay in float storage
    vbig = v.copy()
    vbig[0] = 70_000
    hbig = hybrid_from_coo(r, c, vbig.astype(np.int64), n, T=64)
    assert hbig.bm.tiles.dtype == np.float32


def test_hybrid_assume_unique_matches_accumulate(rng):
    # the fast assignment-fill path (unique cooler pixels) must produce
    # the exact layout the accumulate path builds: same tiles (incl. the
    # diagonal-tile lower-triangle mirror), same scattered split
    n = 300
    M = _mixed_matrix(rng, n)
    r, c, v = _upper_coo(M)
    for occ in (1, 64, 10**9):
        ha = hybrid_from_coo(r, c, v, n, T=64, min_tile_occ=occ)
        hu = hybrid_from_coo(r, c, v, n, T=64, min_tile_occ=occ,
                             assume_unique=True)
        np.testing.assert_array_equal(ha.bm.tiles, hu.bm.tiles)
        np.testing.assert_array_equal(ha.bm.brow, hu.bm.brow)
        np.testing.assert_array_equal(ha.bm.bcol, hu.bm.bcol)
        np.testing.assert_array_equal(ha.sc_cols, hu.sc_cols)
        np.testing.assert_array_equal(ha.sc_vals, hu.sc_vals)
        np.testing.assert_array_equal(ha.bounds, hu.bounds)
    # uint16 storage is preserved on the fast path too
    hu16 = hybrid_from_coo(r, c, v.astype(np.int32), n, T=64,
                           min_tile_occ=64, assume_unique=True)
    assert hu16.bm.tiles.dtype == np.uint16


def test_hybrid_memory_stays_on_nnz_scale(rng):
    # the scenario that kills the pure tile layout: pixels scattered over
    # the whole plane — hybrid keeps them as COO, not 64x64 tiles
    n = 4096
    r = rng.integers(0, n, 5000)
    c = rng.integers(0, n, 5000)
    lo, hi = np.minimum(r, c), np.maximum(r, c)
    keys = np.unique(lo.astype(np.int64) * n + hi)
    h = hybrid_from_coo(keys // n, keys % n, np.ones(keys.size), n, T=64,
                        min_tile_occ=32)
    tile_bytes = h.bm.tiles.size * 4
    coo_bytes = h.sc_cols.size * 8
    assert tile_bytes + coo_bytes < 2_000_000, (tile_bytes, coo_bytes)


def test_grid_and_unique_occupancy_paths_identical(monkeypatch):
    """hybrid_from_coo counts tile occupancy on a flat [R*R] grid only
    while that grid is small (at 1 kb it would be ~4.7 GB); the np.unique
    path past the cap must build the identical hybrid."""
    import hichap_master_tpu.ops.sparse_hybrid as sh

    rng = np.random.default_rng(3)
    n, nnz = 4000, 20000
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, n, nnz)
    k = np.unique(np.minimum(r, c) * n + np.maximum(r, c))
    lo, hi = k // n, k % n
    v = rng.integers(1, 100, k.size)

    h1 = sh.hybrid_from_coo(lo, hi, v, n, assume_unique=True)
    monkeypatch.setattr(sh, "_GRID_CELL_CAP", 1)
    h2 = sh.hybrid_from_coo(lo, hi, v, n, assume_unique=True)
    for a, b in [(h1.bm.tiles, h2.bm.tiles), (h1.bm.brow, h2.bm.brow),
                 (h1.bm.bcol, h2.bm.bcol), (h1.sc_cols, h2.sc_cols),
                 (h1.sc_vals, h2.sc_vals), (h1.bounds, h2.bounds)]:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
