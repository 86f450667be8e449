"""ICE balancing parity vs the straight-line numpy oracle."""

import numpy as np
import jax.numpy as jnp

from hichap_master_tpu.core.contacts import pad_to_bucket
from hichap_master_tpu.ops import ice_balance, ice_balance_batch
from hichap_master_tpu.ops.balance import balanced_matrix
from hichap_master_tpu.testing.oracles import oracle_ice, synthetic_contact_matrix


def _pad(M, N):
    out = np.zeros((N, N), dtype=np.float64)
    out[: M.shape[0], : M.shape[1]] = M
    return out


def test_ice_matches_oracle(rng):
    n = 180
    M = synthetic_contact_matrix(rng, n, gap_frac=0.1, scale=60.0)
    N = pad_to_bucket(n)
    w, stats = ice_balance(jnp.asarray(_pad(M, N)), jnp.asarray(n))
    w = np.asarray(w)[:n]
    ow = oracle_ice(M)
    assert bool(stats["converged"])
    np.testing.assert_array_equal(np.isnan(w), np.isnan(ow))
    m = ~np.isnan(ow)
    np.testing.assert_allclose(w[m], ow[m], rtol=1e-6)


def test_ice_balanced_marginals_near_one(rng):
    n = 160
    M = synthetic_contact_matrix(rng, n, gap_frac=0.0, scale=100.0)
    N = pad_to_bucket(n)
    Mp = jnp.asarray(_pad(M, N))
    w, _ = ice_balance(Mp, jnp.asarray(n))
    B = np.array(balanced_matrix(Mp, w))[:n, :n]
    # zero the ignored diagonal as the algorithm does
    np.fill_diagonal(B, 0)
    marg = np.nansum(B, axis=1)
    keep = ~np.isnan(np.asarray(w)[:n])
    assert np.allclose(marg[keep], 1.0, atol=2e-2)


def test_ice_batch(rng):
    ns = [100, 140]
    N = pad_to_bucket(max(ns))
    Ms = [synthetic_contact_matrix(rng, n, scale=70.0) for n in ns]
    batch = jnp.asarray(np.stack([_pad(m, N) for m in Ms]))
    ws, _ = ice_balance_batch(batch, jnp.asarray(np.array(ns)))
    for i, (m, n) in enumerate(zip(Ms, ns)):
        ow = oracle_ice(m)
        w = np.asarray(ws)[i, :n]
        msk = ~np.isnan(ow)
        np.testing.assert_allclose(w[msk], ow[msk], rtol=1e-6)


def test_ice_all_filtered(rng):
    # A tiny/sparse matrix where every bin fails min_nnz: all-NaN weights, no crash.
    n = 30
    M = np.zeros((n, n))
    M[0, 1] = M[1, 0] = 3
    N = pad_to_bucket(n)
    w, stats = ice_balance(jnp.asarray(_pad(M, N)), jnp.asarray(n))
    assert np.isnan(np.asarray(w)[:n]).all()


def test_ice_fast_mode_close_to_f32(rng):
    n = 160
    M = synthetic_contact_matrix(rng, n, gap_frac=0.05, scale=60.0)
    N = pad_to_bucket(n)
    Mp = jnp.asarray(_pad(M, N), jnp.float32)
    w32, _ = ice_balance(Mp, jnp.asarray(n), tol=0.0, max_iters=40)
    wf, _ = ice_balance(Mp, jnp.asarray(n), tol=0.0, max_iters=40, fast=True)
    a, b = np.asarray(w32), np.asarray(wf)
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
    m = ~np.isnan(a)
    assert np.max(np.abs(a[m] - b[m]) / np.abs(a[m])) < 5e-3
