"""Band-built DI / gap mask must equal the dense-matrix formulations."""

import jax.numpy as jnp
import numpy as np
import pytest

from hichap_master_tpu.models.tads import _bands_from_coo
from hichap_master_tpu.ops.di import (directionality_index,
                                      directionality_index_band,
                                      tad_gap_mask, tad_gap_mask_counts)

W, LOCAL = 7, 4


@pytest.fixture
def dense_and_coo():
    rng = np.random.default_rng(9)
    n, N = 150, 256
    M = np.zeros((N, N), np.float32)
    A = rng.poisson(1.2, (n, n)).astype(np.float32)
    A = np.triu(A) + np.triu(A, 1).T
    A[40:55, :] = 0  # a gap block
    A[:, 40:55] = 0
    M[:n, :n] = A
    iu = np.triu_indices(n)
    nz = A[iu] != 0
    rows, cols, vals = iu[0][nz], iu[1][nz], A[iu][nz].astype(np.float64)
    return M, rows, cols, vals, n, N


@pytest.mark.parametrize("test_type", ["ttest", "chitest"])
def test_band_di_matches_dense(dense_and_coo, test_type):
    M, rows, cols, vals, n, N = dense_and_coo
    up, down, cnt = _bands_from_coo(rows, cols, vals, N, W, LOCAL)
    gap = np.zeros(N, bool)
    gap[3:6] = True
    gap[n:] = True
    di_dense = np.asarray(directionality_index(
        jnp.asarray(M), jnp.asarray(gap), jnp.asarray(n), W, test_type))
    di_band = np.asarray(directionality_index_band(
        jnp.asarray(up), jnp.asarray(down), jnp.asarray(gap),
        jnp.asarray(n), test_type))
    np.testing.assert_allclose(di_band, di_dense, rtol=1e-6, atol=1e-7)


def test_band_gap_counts_match_dense(dense_and_coo):
    M, rows, cols, vals, n, N = dense_and_coo
    _, _, cnt = _bands_from_coo(rows, cols, vals, N, W, LOCAL)
    dense_mask = np.asarray(tad_gap_mask(jnp.asarray(M), jnp.asarray(n),
                                         LOCAL))
    band_mask = np.asarray(tad_gap_mask_counts(jnp.asarray(cnt),
                                               jnp.asarray(n), LOCAL))
    np.testing.assert_array_equal(band_mask, dense_mask)


def test_band_gap_counts_match_dense_balanced(dense_and_coo):
    # weights with a zeroed bin: balanced-zero entries must not count
    M, rows, cols, vals, n, N = dense_and_coo
    rng = np.random.default_rng(1)
    w = rng.uniform(0.5, 1.5, N)
    w[70] = 0.0
    Mb = M * w[:, None] * w[None, :]
    bv = np.nan_to_num(vals * w[rows] * w[cols])
    _, _, cnt = _bands_from_coo(rows, cols, bv, N, W, LOCAL)
    dense_mask = np.asarray(tad_gap_mask(jnp.asarray(Mb.astype(np.float32)),
                                         jnp.asarray(n), LOCAL))
    band_mask = np.asarray(tad_gap_mask_counts(jnp.asarray(cnt),
                                               jnp.asarray(n), LOCAL))
    np.testing.assert_array_equal(band_mask, dense_mask)
