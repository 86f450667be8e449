"""Pallas kernel parity (interpret mode on CPU; compiled path exercised on
TPU by bench/verification runs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hichap_master_tpu.kernels.pallas_ice import (
    TILE_C,
    ice_balance_pallas,
    pallas_ice_sweeps,
)
from hichap_master_tpu.ops.balance import ice_balance, _zero_diags
from hichap_master_tpu.testing.oracles import synthetic_contact_matrix


def test_pallas_ice_matches_xla(rng):
    # interpret mode executes one Python call per grid step — keep the
    # iteration count small (parity at convergence is covered on TPU by the
    # bench/verification runs).
    N, n = TILE_C, 1800
    M = np.zeros((N, N), np.float32)
    M[:n, :n] = synthetic_contact_matrix(rng, n, gap_frac=0.05, scale=60.0)
    w_ref, s_ref = ice_balance(jnp.asarray(M), jnp.asarray(n), tol=0.0,
                               max_iters=10)
    w_pal, s_pal = ice_balance_pallas(jnp.asarray(M), n, tol=0.0,
                                      max_iters=10, block=10, interpret=True)
    wr, wp = np.asarray(w_ref), np.asarray(w_pal)
    assert (np.isnan(wr) == np.isnan(wp)).all()
    m = ~np.isnan(wr)
    np.testing.assert_allclose(wp[m], wr[m], rtol=2e-5)
    assert s_pal["iters"] == 10


def test_pallas_sweep_single_iteration_exact(rng):
    """One sweep == one hand-computed ICE iteration."""
    N = TILE_C
    n = N
    M = np.zeros((N, N), np.float32)
    M[:n, :n] = synthetic_contact_matrix(rng, n, gap_frac=0.0, scale=40.0)
    M0 = np.asarray(_zero_diags(jnp.asarray(M), 1))
    b0 = np.ones((1, N), np.float32)
    b1, var, scale = pallas_ice_sweeps(jnp.asarray(M0), jnp.asarray(b0),
                                       iters=1, interpret=True)
    marg = (M0 @ np.ones(N)) * np.ones(N)
    nz = marg != 0
    mean = marg[nz].mean()
    want_var = marg[nz].var()
    margn = marg / mean
    margn[margn == 0] = 1
    np.testing.assert_allclose(np.asarray(b1)[0], 1.0 / margn, rtol=1e-6)
    assert float(scale) == pytest.approx(mean, rel=1e-6)
    assert float(var) == pytest.approx(want_var, rel=1e-5)


def test_pallas_ice_bf16_mode(rng):
    N, n = TILE_C, 1800
    M = np.zeros((N, N), np.float32)
    M[:n, :n] = synthetic_contact_matrix(rng, n, gap_frac=0.05, scale=60.0)
    w_ref, _ = ice_balance(jnp.asarray(M), jnp.asarray(n), tol=0.0,
                           max_iters=10)
    w_fast, s = ice_balance_pallas(jnp.asarray(M), n, tol=0.0, max_iters=10,
                                   block=10, fast=True, interpret=True)
    wr, wf = np.asarray(w_ref), np.asarray(w_fast)
    assert (np.isnan(wr) == np.isnan(wf)).all()
    m = ~np.isnan(wr)
    # bf16-stored matrix: same weights to ~1e-3 relative
    np.testing.assert_allclose(wf[m], wr[m], rtol=3e-3)
