"""Stable rectangle formulation: exactness at pixels + f32 robustness at
production-scale magnitudes where a global SAT loses precision."""

import numpy as np
import jax.numpy as jnp
import pytest

from hichap_master_tpu.ops.loops_kernel import (
    donut_at_stable,
    donut_sums,
    lowerleft_at_stable,
    lowerleft_sums,
    oracle_region_sums,
    row_prefix,
    sat,
)


def test_stable_matches_bruteforce(rng):
    N, w, pw = 64, 5, 2
    M = rng.poisson(2.0, (N, N)).astype(np.float32)
    S1 = row_prefix(jnp.asarray(M))
    pts = [(10, 20), (0, 3), (60, 63), (30, 30), (2, 62)]
    xi = jnp.asarray([p[0] for p in pts])
    yi = jnp.asarray([p[1] for p in pts])
    K = np.asarray(donut_at_stable(S1, xi, yi, w, pw))
    Y = np.asarray(lowerleft_at_stable(S1, xi, yi, w, pw))
    for k, (x, y) in enumerate(pts):
        ok, oy = oracle_region_sums(M.astype(float), x, y, w, pw)
        assert K[k] == pytest.approx(ok), (x, y)
        assert Y[k] == pytest.approx(oy), (x, y)


def test_stable_beats_global_sat_in_f32(rng):
    """With ~1e8 total counts, f32 global-SAT donuts drift; the stable form
    stays within float rounding of the float64 truth."""
    N, w, pw = 1024, 5, 2
    M = rng.poisson(100.0, (N, N)).astype(np.float32)  # total ~1e8
    truth_S1 = row_prefix(jnp.asarray(M, jnp.float64))
    xi = jnp.asarray(rng.integers(w, N - w, 200))
    yi = jnp.asarray(rng.integers(w, N - w, 200))
    truth = np.asarray(donut_at_stable(truth_S1, xi, yi, w, pw))

    stable32 = np.asarray(donut_at_stable(
        row_prefix(jnp.asarray(M, jnp.float32)), xi, yi, w, pw))
    sat32 = np.asarray(donut_sums(sat(jnp.asarray(M, jnp.float32)), w, pw))[
        np.asarray(xi), np.asarray(yi)]

    err_stable = np.abs(stable32 - truth).max()
    err_sat = np.abs(sat32 - truth).max()
    assert err_stable <= 1.0, f"stable form drifted: {err_stable}"
    assert err_stable * 4 <= max(err_sat, 1e-9) or err_sat < 1.0, (
        f"stable ({err_stable}) not better than global SAT ({err_sat})")
