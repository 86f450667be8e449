"""Sorted-COO range-query imputation kernel (ops/sparse_impute.py) vs the
dense disk-gather kernel and the numpy oracle — the op that takes the
haplotype disk vote (HiCHap/matrixBuilding.py:1302-1493) past the dense
genome-wide cap."""

import jax.numpy as jnp
import numpy as np
import pytest

from hichap_master_tpu.ops.imputation import disk_offsets, impute_inter_oracle
from hichap_master_tpu.ops.sparse_impute import (SparseU, disk_row_intervals,
                                                 lex_searchsorted,
                                                 sparse_disk_sums,
                                                 sparse_disk_sums_rowptr,
                                                 sparse_impute_vote,
                                                 sparse_impute_vote_rowptr)


@pytest.mark.parametrize("L", [1, 2, 3, 5, 8, 13, 40])
def test_disk_row_intervals_cover_disk(L):
    di, dj = disk_offsets(L)
    rows, lo, hi = disk_row_intervals(L)
    got = {(int(r), int(j)) for r, a, b in zip(rows, lo, hi)
           for j in range(int(a), int(b) + 1)}
    want = set(zip(di.tolist(), dj.tolist()))
    assert got == want


def _random_sym_coo(rng, S, nnz):
    r = rng.integers(0, S, nnz)
    c = rng.integers(0, S, nnz)
    lo, hi = np.minimum(r, c), np.maximum(r, c)
    keys = np.unique(lo.astype(np.int64) * S + hi)
    rows, cols = keys // S, keys % S
    vals = rng.integers(1, 9, rows.size)
    return rows, cols, vals


def test_lex_searchsorted_matches_numpy(rng):
    S = 200
    rows, cols, vals = _random_sym_coo(rng, S, 500)
    su = SparseU(rows, cols, vals, S)
    sr, sc = np.asarray(su.srows), np.asarray(su.scols)
    qr = rng.integers(-1, S + 1, 300)
    qc = rng.integers(0, S + 1, 300)  # nonneg keeps the int-key map lex-true
    got = np.asarray(lex_searchsorted(su.srows, su.scols, jnp.asarray(qr),
                                      jnp.asarray(qc), su.iters))
    keys = sr.astype(np.int64) * (S + 2) + sc
    want = np.searchsorted(keys, qr.astype(np.int64) * (S + 2) + qc, "left")
    np.testing.assert_array_equal(got, want)


def test_sparse_disk_sums_match_dense(rng):
    S, L = 120, 7
    rows, cols, vals = _random_sym_coo(rng, S, 900)
    U = np.zeros((S, S))
    U[rows, cols] = vals
    U[cols, rows] = vals
    su = SparseU(rows, cols, vals, S)
    di, dj = disk_offsets(L)
    ri, lo, hi = disk_row_intervals(L)
    q = 50
    r = rng.integers(L, S - L - 1, q)
    c = rng.integers(L, S - L - 1, q)
    got = np.asarray(sparse_disk_sums(
        su.srows, su.scols, su.cum32, jnp.asarray(r), jnp.asarray(c),
        jnp.asarray(ri), jnp.asarray(lo), jnp.asarray(hi), su.iters))
    want = np.asarray([U[rr + di, cc + dj].sum() for rr, cc in zip(r, c)])
    np.testing.assert_array_equal(got, want)


def test_sparse_vote_matches_oracle(rng):
    S, L = 90, 4
    rows, cols, vals = _random_sym_coo(rng, S, 700)
    U = np.zeros((S, S))
    U[rows, cols] = vals
    U[cols, rows] = vals
    su = SparseU(rows, cols, vals, S)
    ri, lo, hi = disk_row_intervals(L)
    q = 400
    # include out-of-window rows on purpose: the boundary drop rule must
    # match the dense kernel exactly
    rk = rng.integers(0, S, q)
    cs = rng.integers(0, S, q)
    cc = rng.integers(0, S, q)
    valid = rng.random(q) < 0.9
    hit, tgt = sparse_impute_vote(
        su.srows, su.scols, su.cum32, jnp.asarray(rk), jnp.asarray(cs),
        jnp.asarray(cc), jnp.asarray(valid), jnp.asarray(ri), jnp.asarray(lo),
        jnp.asarray(hi), jnp.int32(S), L, 2.0, 0.6, su.iters)
    hit, tgt = np.asarray(hit), np.asarray(tgt)

    imp = np.zeros((S, S))
    np.add.at(imp, (rk[hit], tgt[hit]), 1)
    want = impute_inter_oracle(np.zeros((S, S)), U, rk[valid], cs[valid],
                               cc[valid], L, 2.0, 0.6)
    np.testing.assert_array_equal(imp, want)


def test_rowptr_disk_sums_match_lex(rng):
    """The production row-pointer-bounded search (round 5) against the lex
    binary-search oracle, same disk queries."""
    S, L = 150, 9
    rows, cols, vals = _random_sym_coo(rng, S, 1200)
    su = SparseU(rows, cols, vals, S)
    ri, lo, hi = disk_row_intervals(L)
    q = 200
    r = rng.integers(L, S - L - 1, q)
    c = rng.integers(L, S - L - 1, q)
    want = np.asarray(sparse_disk_sums(
        su.srows, su.scols, su.cum32, jnp.asarray(r), jnp.asarray(c),
        jnp.asarray(ri), jnp.asarray(lo), jnp.asarray(hi), su.iters))
    got = np.asarray(sparse_disk_sums_rowptr(
        su.scols, su.cum32, su.row_ptr, jnp.asarray(r), jnp.asarray(c),
        jnp.asarray(ri), jnp.asarray(lo), jnp.asarray(hi), su.row_iters))
    np.testing.assert_array_equal(got, want)


def test_rowptr_vote_matches_lex_and_oracle(rng):
    S, L = 90, 4
    rows, cols, vals = _random_sym_coo(rng, S, 700)
    U = np.zeros((S, S))
    U[rows, cols] = vals
    U[cols, rows] = vals
    su = SparseU(rows, cols, vals, S)
    ri, lo, hi = disk_row_intervals(L)
    q = 400
    rk = rng.integers(0, S, q)
    cs = rng.integers(0, S, q)
    cc = rng.integers(0, S, q)
    valid = rng.random(q) < 0.9
    hit, tgt = sparse_impute_vote_rowptr(
        su.scols, su.cum32, su.row_ptr, jnp.asarray(rk), jnp.asarray(cs),
        jnp.asarray(cc), jnp.asarray(valid), jnp.asarray(ri), jnp.asarray(lo),
        jnp.asarray(hi), jnp.int32(S), L, 2.0, 0.6, su.row_iters)
    hit_l, tgt_l = sparse_impute_vote(
        su.srows, su.scols, su.cum32, jnp.asarray(rk), jnp.asarray(cs),
        jnp.asarray(cc), jnp.asarray(valid), jnp.asarray(ri), jnp.asarray(lo),
        jnp.asarray(hi), jnp.int32(S), L, 2.0, 0.6, su.iters)
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(hit_l))
    np.testing.assert_array_equal(np.asarray(tgt)[np.asarray(hit)],
                                  np.asarray(tgt_l)[np.asarray(hit_l)])
    hit, tgt = np.asarray(hit), np.asarray(tgt)
    imp = np.zeros((S, S))
    np.add.at(imp, (rk[hit], tgt[hit]), 1)
    want = impute_inter_oracle(np.zeros((S, S)), U, rk[valid], cs[valid],
                               cc[valid], L, 2.0, 0.6)
    np.testing.assert_array_equal(imp, want)


def test_sparse_u_wrapped_prefix_is_exact():
    # totals past int32 must still give exact window sums via wrap-around
    rows = np.arange(64, dtype=np.int64)
    cols = rows.copy()
    vals = np.full(64, 1 << 26, np.int64)  # total = 2^32 > int32
    su = SparseU(rows, cols, vals, 64)
    got = np.asarray(sparse_disk_sums(
        su.srows, su.scols, su.cum32,
        jnp.asarray(np.arange(1, 63)), jnp.asarray(np.arange(1, 63)),
        jnp.asarray(np.zeros(1, np.int32)), jnp.asarray(np.zeros(1, np.int32)),
        jnp.asarray(np.zeros(1, np.int32)), su.iters))
    np.testing.assert_array_equal(got, np.full(62, 1 << 26))
