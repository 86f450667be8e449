"""Parity of the jitted two-step correction / VC / gap ops vs float64 oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from hichap_master_tpu.ops import (
    correct_vc,
    gap_mask,
    gap_mask_lowres,
    trans2symmetry,
    two_step_correction,
    two_step_correction_batch,
)
from hichap_master_tpu.core.contacts import pad_to_bucket
from hichap_master_tpu.testing.oracles import (
    oracle_gap,
    oracle_gap_lowres,
    oracle_trans2symmetry,
    oracle_two_step,
    oracle_vc,
    synthetic_contact_matrix,
)

RTOL = 1e-9


def _pad(M, N):
    out = np.zeros((N, N), dtype=np.float64)
    out[: M.shape[0], : M.shape[1]] = M
    return out


def test_gap_mask_matches_oracle(rng):
    for n in (67, 130, 200):
        M = synthetic_contact_matrix(rng, n, gap_frac=0.15)
        N = pad_to_bucket(n)
        got = np.asarray(gap_mask(jnp.asarray(_pad(M, N)), jnp.asarray(n)))
        want = np.zeros(N, bool)
        want[oracle_gap(M)] = True
        want[n:] = True
        assert (got == want).all()


def test_gap_mask_lowres_matches_oracle(rng):
    M = synthetic_contact_matrix(rng, 90, gap_frac=0.3)
    N = pad_to_bucket(90)
    got = np.asarray(gap_mask_lowres(jnp.asarray(_pad(M, N)), jnp.asarray(90)))
    want = np.zeros(N, bool)
    want[oracle_gap_lowres(M)] = True
    want[90:] = True
    assert (got == want).all()


def test_trans2symmetry_matches_oracle(rng):
    n = 80
    M = rng.random((n, n)) * 10
    gaps = np.array([3, 7, 40, 41])
    got = np.asarray(trans2symmetry(jnp.asarray(M), jnp.asarray(
        np.isin(np.arange(n), gaps))))
    want = oracle_trans2symmetry(M, gaps)
    np.testing.assert_allclose(got, want, rtol=RTOL)
    # empty gap case
    got0 = np.asarray(trans2symmetry(jnp.asarray(M), jnp.zeros(n, bool)))
    want0 = oracle_trans2symmetry(M, np.array([], dtype=int))
    np.testing.assert_allclose(got0, want0, rtol=RTOL)


def test_vc_matches_oracle(rng):
    M = synthetic_contact_matrix(rng, 100)
    got = np.asarray(correct_vc(jnp.asarray(M)))
    np.testing.assert_allclose(got, oracle_vc(M), rtol=RTOL)


@pytest.mark.parametrize("n", [64, 150])
def test_two_step_matches_oracle(rng, n):
    TM = synthetic_contact_matrix(rng, n, gap_frac=0.05, scale=120.0)
    # Maternal / paternal are noisy subsamples of the traditional matrix.
    MM = np.triu(rng.binomial(TM.astype(int), 0.3).astype(float))
    MM = MM + np.triu(MM, 1).T
    PM = np.triu(rng.binomial(TM.astype(int), 0.28).astype(float))
    PM = PM + np.triu(PM, 1).T

    N = pad_to_bucket(n)
    nor_mm, nor_pm, gm, gp = two_step_correction(
        jnp.asarray(_pad(TM, N)), jnp.asarray(_pad(MM, N)),
        jnp.asarray(_pad(PM, N)), jnp.asarray(n))
    o_mm, o_pm, o_gm, o_gp = oracle_two_step(TM, MM, PM)

    np.testing.assert_allclose(np.asarray(nor_mm)[:n, :n], o_mm, rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(nor_pm)[:n, :n], o_pm, rtol=1e-6, atol=1e-12)
    got_gm = np.flatnonzero(np.asarray(gm)[:n])
    got_gp = np.flatnonzero(np.asarray(gp)[:n])
    assert (got_gm == o_gm).all()
    assert (got_gp == o_gp).all()
    # padding stayed clean
    assert np.asarray(nor_mm)[n:].sum() == 0


def test_two_step_batch_consistent(rng):
    mats = []
    ns = [70, 120, 95]
    N = pad_to_bucket(max(ns))
    TMs, MMs, PMs = [], [], []
    for n in ns:
        TM = synthetic_contact_matrix(rng, n, scale=80.0)
        MM = np.triu(rng.binomial(TM.astype(int), 0.3).astype(float))
        MM = MM + np.triu(MM, 1).T
        PM = np.triu(rng.binomial(TM.astype(int), 0.3).astype(float))
        PM = PM + np.triu(PM, 1).T
        TMs.append(_pad(TM, N)); MMs.append(_pad(MM, N)); PMs.append(_pad(PM, N))
        mats.append((TM, MM, PM))
    out_mm, out_pm, _, _ = two_step_correction_batch(
        jnp.asarray(np.stack(TMs)), jnp.asarray(np.stack(MMs)),
        jnp.asarray(np.stack(PMs)), jnp.asarray(np.array(ns)))
    for i, (TM, MM, PM) in enumerate(mats):
        o_mm, o_pm, _, _ = oracle_two_step(TM, MM, PM)
        n = ns[i]
        np.testing.assert_allclose(np.asarray(out_mm)[i, :n, :n], o_mm,
                                   rtol=1e-6, atol=1e-12)
