"""Masked reductions vs numpy oracles (np.percentile linear interpolation
semantics is load-bearing for the gap/alpha rules)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hichap_master_tpu.ops.masked import (masked_max, masked_mean,
                                          masked_median, masked_min,
                                          masked_percentile, masked_var,
                                          valid_row_mask)


@pytest.fixture
def data(rng):
    v = rng.normal(3.0, 2.0, 257)
    m = rng.random(257) < 0.7
    m[:3] = True  # never empty
    return jnp.asarray(v), jnp.asarray(m), v, m


@pytest.mark.parametrize("q", [0.0, 20.0, 25.0, 50.0, 80.0, 100.0])
def test_masked_percentile_matches_numpy(data, q):
    vj, mj, v, m = data
    got = float(masked_percentile(vj, mj, q))
    np.testing.assert_allclose(got, np.percentile(v[m], q), rtol=1e-9)


def test_masked_moments_match_numpy(data):
    vj, mj, v, m = data
    np.testing.assert_allclose(float(masked_mean(vj, mj)), v[m].mean(),
                               rtol=1e-9)
    np.testing.assert_allclose(float(masked_var(vj, mj)), v[m].var(),
                               rtol=1e-9)
    np.testing.assert_allclose(float(masked_median(vj, mj)),
                               np.median(v[m]), rtol=1e-9)
    assert float(masked_max(vj, mj)) == v[m].max()
    assert float(masked_min(vj, mj)) == v[m].min()


def test_valid_row_mask():
    got = np.asarray(valid_row_mask(jnp.asarray(3), 6))
    np.testing.assert_array_equal(got, [True] * 3 + [False] * 3)
