"""Fused block-sparse marginal kernel (kernels/pallas_sparse_ice.py) vs the
XLA onehot formulation — interpret mode on CPU.  Compiled Mosaic parity is
exercised on-chip via tests/test_pallas_tpu.py → testing/pallas_check.py
(run_sparse_ice_parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hichap_master_tpu.kernels.pallas_sparse_ice import block_sym_matvec_pallas
from hichap_master_tpu.ops.sparse import block_sym_matvec, blocks_from_coo

T = 128


def _random_blocks(rng, n, nnz):
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, n, nnz)
    rows, cols = np.minimum(r, c), np.maximum(r, c)
    vals = rng.poisson(3.0, nnz).astype(np.float32) + 0.25
    return blocks_from_coo(rows, cols, vals, n, T)


@pytest.mark.parametrize("n,nnz", [(300, 4000), (700, 20000)])
def test_marginal_parity_interpret(n, nnz):
    rng = np.random.default_rng(n)
    bm = _random_blocks(rng, n, nnz)
    b = jnp.asarray(rng.random(bm.R * T).astype(np.float32))
    y_x = np.asarray(block_sym_matvec(jnp.asarray(bm.tiles),
                                      jnp.asarray(bm.brow),
                                      jnp.asarray(bm.bcol), b,
                                      R=bm.R, T=T, reduce="onehot"))
    y_p = np.asarray(block_sym_matvec_pallas(
        jnp.asarray(bm.tiles), jnp.asarray(bm.brow), jnp.asarray(bm.bcol),
        b, R=bm.R, T=T, G=4, interpret=True))
    np.testing.assert_allclose(y_p, y_x, rtol=1e-5, atol=1e-3)


def test_marginal_pad_group_remainder():
    """K not a multiple of G: zero padding tiles must contribute nothing."""
    rng = np.random.default_rng(7)
    bm = _random_blocks(rng, 400, 3000)
    assert bm.K % 5 != 0 or bm.K % 7 != 0
    b = jnp.asarray(rng.random(bm.R * T).astype(np.float32))
    ys = [np.asarray(block_sym_matvec_pallas(
        jnp.asarray(bm.tiles), jnp.asarray(bm.brow), jnp.asarray(bm.bcol),
        b, R=bm.R, T=T, G=G, interpret=True)) for G in (5, 7)]
    np.testing.assert_allclose(ys[0], ys[1], rtol=1e-6)


def test_marginal_bf16_tiles_interpret():
    """bf16 tile stream, f32 accumulate — the fast-mode contract."""
    rng = np.random.default_rng(3)
    bm = _random_blocks(rng, 350, 5000)
    b = jnp.asarray(rng.random(bm.R * T).astype(np.float32))
    y32 = np.asarray(block_sym_matvec_pallas(
        jnp.asarray(bm.tiles), jnp.asarray(bm.brow), jnp.asarray(bm.bcol),
        b, R=bm.R, T=T, G=4, interpret=True))
    y16 = np.asarray(block_sym_matvec_pallas(
        jnp.asarray(bm.tiles, jnp.bfloat16), jnp.asarray(bm.brow),
        jnp.asarray(bm.bcol), b, R=bm.R, T=T, G=4, interpret=True))
    np.testing.assert_allclose(y16, y32, rtol=2e-2, atol=0.5)


def test_marginal_dense_oracle():
    """End-to-end against the dense matvec (not just the XLA block path)."""
    rng = np.random.default_rng(1)
    n = 260
    M = rng.poisson(1.0, (n, n)).astype(np.float32)
    M = np.triu(M) + np.triu(M, 1).T
    from hichap_master_tpu.ops.sparse import blocks_from_dense

    bm = blocks_from_dense(M, T)
    x = rng.random(n).astype(np.float32)
    xp = np.zeros(bm.R * T, np.float32)
    xp[:n] = x
    y = np.asarray(block_sym_matvec_pallas(
        jnp.asarray(bm.tiles), jnp.asarray(bm.brow), jnp.asarray(bm.bcol),
        jnp.asarray(xp), R=bm.R, T=T, G=3, interpret=True))[:n]
    np.testing.assert_allclose(y, M @ x, rtol=1e-5, atol=1e-3)
