"""Block-sparse genome-wide engine vs dense oracles (ops/sparse.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hichap_master_tpu.ops.balance import ice_balance
from hichap_master_tpu.ops.correct import genomewide_correction
from hichap_master_tpu.ops.sparse import (
    AsymBlocks,
    BlockMatrix,
    asym_blocks_from_coo,
    asym_blocks_to_dense,
    blocks_from_coo,
    blocks_from_dense,
    blocks_to_coo,
    blocks_to_dense,
    block_sym_matvec,
    genomewide_correction_blocks,
    ice_balance_blocks,
    pad_blocks,
    sparse_ice_balance,
)


def _banded_sym(rng, n, band=40, lam=30.0):
    """Sparse symmetric banded + sprinkled off-band counts."""
    i = np.arange(n)
    d = np.abs(np.subtract.outer(i, i))
    M = rng.poisson(lam / (d + 1.0)) * (d < band)
    # sprinkle far-field contacts so some off-band tiles are occupied
    k = n * 4
    r = rng.integers(0, n, k)
    c = rng.integers(0, n, k)
    M[r, c] += 1
    M = np.triu(M)
    M = (M + np.triu(M, 1).T).astype(np.float64)
    return M


def test_roundtrip_dense(rng):
    n = 300
    M = _banded_sym(rng, n)
    bm = blocks_from_dense(M, T=64)
    assert bm.R == 5 and bm.K < bm.R * (bm.R + 1) // 2 + 1
    np.testing.assert_array_equal(blocks_to_dense(bm), M)


def test_roundtrip_coo(rng):
    n = 200
    M = _banded_sym(rng, n)
    iu = np.triu_indices(n)
    v = M[iu]
    nz = v != 0
    bm = blocks_from_coo(iu[0][nz], iu[1][nz], v[nz], n, T=64)
    np.testing.assert_array_equal(blocks_to_dense(bm), M)
    r, c, vv = blocks_to_coo(bm)
    D = np.zeros((n, n))
    D[r, c] = vv
    np.testing.assert_array_equal(D, np.triu(M))


@pytest.mark.parametrize("reduce", ["onehot", "scatter", "scan"])
def test_matvec_matches_dense(rng, reduce):
    n = 317  # not a multiple of T
    M = _banded_sym(rng, n)
    bm = blocks_from_dense(M, T=64)
    b = rng.uniform(0.5, 2.0, bm.R * bm.T)
    b[n:] = 0.0
    y = block_sym_matvec(jnp.asarray(bm.tiles), jnp.asarray(bm.brow),
                         jnp.asarray(bm.bcol), jnp.asarray(b),
                         R=bm.R, T=bm.T, reduce=reduce)
    np.testing.assert_allclose(np.asarray(y)[:n], M @ b[:n], rtol=1e-12)


def test_sparse_ice_matches_dense(rng):
    n = 400
    M = _banded_sym(rng, n, band=80)
    bm = blocks_from_dense(M, T=128)
    # dense oracle on the same padded size
    P = bm.R * bm.T
    Mp = np.zeros((P, P))
    Mp[:n, :n] = M
    w_d, st_d = ice_balance(jnp.asarray(Mp), jnp.asarray(n))
    w_s, st_s = ice_balance_blocks(bm)
    w_d = np.asarray(w_d)[:n]
    w_s = np.asarray(w_s)
    np.testing.assert_array_equal(np.isnan(w_d), np.isnan(w_s))
    m = ~np.isnan(w_d)
    np.testing.assert_allclose(w_s[m], w_d[m], rtol=1e-8)
    assert int(st_s["iters"]) == int(st_d["iters"])


def test_scan_reduce_survives_large_prefix_magnitude(rng):
    """The compensated prefix must recover small segment sums sitting on a
    ~1e8 running total — the exact cancellation that kills a plain f32
    cumsum (measured; see ops/sparse_hybrid.py)."""
    from hichap_master_tpu.ops.sparse import _segsum_scan

    K, T, R = 4096, 8, 64
    data = (rng.uniform(0.0, 1e5, (K, T)) + 1.0).astype(np.float32)
    seg = np.sort(rng.integers(0, R, K)).astype(np.int32)
    got = np.asarray(_segsum_scan(jnp.asarray(data), jnp.asarray(seg), R))
    want = np.zeros((R, T))
    np.add.at(want, seg, data.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-6)
    # unsorted segment ids take the same path through the argsort
    perm = rng.permutation(K)
    got_u = np.asarray(_segsum_scan(jnp.asarray(data[perm]),
                                    jnp.asarray(seg[perm]), R))
    np.testing.assert_allclose(got_u, want, rtol=2e-6)


def test_sparse_ice_scan_reduce_matches_onehot(rng):
    n = 400
    M = _banded_sym(rng, n, band=80)
    bm = blocks_from_dense(M.astype(np.float32), T=128)
    w_o, st_o = ice_balance_blocks(bm, reduce="onehot")
    w_s, st_s = ice_balance_blocks(bm, reduce="scan")
    w_o, w_s = np.asarray(w_o), np.asarray(w_s)
    np.testing.assert_array_equal(np.isnan(w_o), np.isnan(w_s))
    m = ~np.isnan(w_o)
    np.testing.assert_allclose(w_s[m], w_o[m], rtol=1e-5)
    assert abs(int(st_s["iters"]) - int(st_o["iters"])) <= 1


def test_sparse_ice_padded_tiles_no_effect(rng):
    n = 200
    M = _banded_sym(rng, n)
    bm = blocks_from_dense(M, T=64)
    w1, _ = ice_balance_blocks(bm)
    w2, _ = ice_balance_blocks(pad_blocks(bm, 8))
    m = ~np.isnan(np.asarray(w1))
    np.testing.assert_allclose(np.asarray(w2)[m], np.asarray(w1)[m],
                               rtol=1e-12)


def test_asym_roundtrip(rng):
    n = 150
    H = rng.poisson(2.0, (n, n)).astype(np.float64)
    r, c = np.nonzero(H)
    ab = asym_blocks_from_coo(r, c, H[r, c], n, T=64)
    np.testing.assert_array_equal(asym_blocks_to_dense(ab), H)


def test_sparse_genomewide_correction_matches_dense(rng):
    n = 330
    H = rng.poisson(1.5, (n, n)).astype(np.float64)
    # make it band-heavy like a real imputed genome-wide matrix
    i = np.arange(n)
    d = np.abs(np.subtract.outer(i, i))
    H = H * (d < 120) + rng.poisson(4.0, (n, n)) * (d < 20)
    alpha = rng.uniform(0.3, 1.0, n)

    r, c = np.nonzero(H)
    ab = asym_blocks_from_coo(r, c, H[r, c], n, T=128, dtype=np.float64)
    bm = genomewide_correction_blocks(ab, alpha)
    got = blocks_to_dense(bm)

    P = ab.R * ab.T
    Hp = np.zeros((P, P))
    Hp[:n, :n] = H
    ap = np.ones(P)
    ap[:n] = alpha
    want = np.asarray(genomewide_correction(
        jnp.asarray(Hp), jnp.asarray(ap), jnp.asarray(n)))[:n, :n]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_correction_coo_matches_blocks_and_dense(rng):
    """The closed-form COO correction == the tile form == the dense op,
    including scattered inter pixels (the case whose tile storage blows
    up) and the empty-row f=1 rule."""
    from hichap_master_tpu.ops.sparse import genomewide_correction_coo

    n = 330
    H = rng.poisson(1.5, (n, n)).astype(np.float64)
    i = np.arange(n)
    d = np.abs(np.subtract.outer(i, i))
    # band-heavy + genuinely scattered far pixels + some all-zero rows
    H = H * (d < 40) + (rng.random((n, n)) < 0.01) * rng.poisson(3.0, (n, n))
    H[17, :] = 0
    H[:, 17] = 0
    alpha = rng.uniform(0.3, 1.0, n)

    r, c = np.nonzero(H)
    cr, cc, cv = genomewide_correction_coo(r, c, H[r, c], alpha, n)
    got = np.zeros((n, n))
    got[cr, cc] = cv
    got = np.triu(got) + np.triu(got, 1).T

    ab = asym_blocks_from_coo(r, c, H[r, c], n, T=128, dtype=np.float64)
    tiles = blocks_to_dense(genomewide_correction_blocks(ab, alpha))
    np.testing.assert_allclose(got, tiles, rtol=1e-9, atol=1e-12)

    P = ab.R * ab.T
    Hp = np.zeros((P, P))
    Hp[:n, :n] = H
    ap = np.ones(P)
    ap[:n] = alpha
    want = np.asarray(genomewide_correction(
        jnp.asarray(Hp), jnp.asarray(ap), jnp.asarray(n)))[:n, :n]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_sparse_ice_empty_and_tiny():
    bm = blocks_from_coo(np.zeros(0), np.zeros(0), np.zeros(0), 64, T=64)
    w, st = ice_balance_blocks(bm, max_iters=5)
    assert np.isnan(np.asarray(w)).all()


@pytest.mark.slow
def test_storage_wins_at_scale(rng):
    """The representability claim: banded occupancy keeps tile storage
    linear in n while dense grows quadratically."""
    n = 4096
    i = np.arange(n)
    d = np.abs(np.subtract.outer(i, i))
    M = (rng.poisson(30.0 / (d + 1.0)) * (d < 64)).astype(np.float64)
    M = np.triu(M)
    M = M + np.triu(M, 1).T
    bm = blocks_from_dense(M, T=128)
    assert bm.nbytes() < 0.15 * bm.dense_nbytes()


def test_sparse_ice_fast_mode_close(rng):
    """fast=True (bf16 tiles, f32 accumulation) must track the f32 weights
    within the documented ~1e-3 relative deviation."""
    n, T = 700, 128
    M = _banded_sym(rng, n).astype(np.float32)
    bm = blocks_from_dense(M, T)
    w32, st32 = sparse_ice_balance(
        jnp.asarray(bm.tiles), jnp.asarray(bm.brow), jnp.asarray(bm.bcol),
        jnp.asarray(n), R=bm.R, T=T, tol=0.0, max_iters=60)
    wf, stf = sparse_ice_balance(
        jnp.asarray(bm.tiles), jnp.asarray(bm.brow), jnp.asarray(bm.bcol),
        jnp.asarray(n), R=bm.R, T=T, tol=0.0, max_iters=60, fast=True)
    a, b = np.asarray(w32)[:n], np.asarray(wf)[:n]
    assert np.array_equal(np.isnan(a), np.isnan(b))
    m = ~np.isnan(a)
    # bf16 rounding compounds per iteration; ~1e-2 after 60 iters
    np.testing.assert_allclose(b[m], a[m], rtol=2e-2)
