"""Fused Pallas escalation ladder vs the XLA map-space path (interpret
mode on CPU; the real Mosaic compile is exercised on TPU by
scripts/perf_loops_pallas.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hichap_master_tpu.kernels.pallas_escalation import escalation_pallas
from hichap_master_tpu.ops.loops_packed import (escalation_packed_maps,
                                                pack_coo, pack_margins)


def _case(rng, n, B, ww, maxww, pw, npix, dense_reads=False):
    e_lo, _e_hi, x_pad = pack_margins(maxww)
    Xp = n + 2 * x_pad + 7  # deliberately unaligned
    nnz = 4 * n
    rows = rng.integers(0, n, nnz)
    offs = rng.integers(0, B, nnz)
    cols = np.minimum(rows + offs, n - 1)
    if dense_reads:
        vals = rng.poisson(30.0, nnz).astype(np.float32)
    else:
        # bimodal: strong rows resolve early, weak rows late/never, so the
        # <10% stopping rule actually truncates the ladder
        strong = (rows % 5 == 0)
        vals = rng.poisson(np.where(strong, 9.0, 1.2), nnz).astype(
            np.float32)
    D_raw = pack_coo(jnp.asarray(rows), jnp.asarray(cols),
                     jnp.asarray(vals), B, Xp, e_lo, x_pad)
    D_bal = pack_coo(jnp.asarray(rows), jnp.asarray(cols),
                     jnp.asarray(vals * 0.37), B, Xp, e_lo, x_pad)
    D_exp = pack_coo(jnp.asarray(rows), jnp.asarray(cols),
                     jnp.asarray(vals * 0.11 + 0.2), B, Xp, e_lo, x_pad)
    e_pix = rng.integers(ww, B - 1, npix).astype(np.int32)
    x_pix = rng.integers(0, n - B, npix).astype(np.int32)
    valid = np.ones(npix, bool)
    valid[::9] = False
    args = (D_raw, D_bal, D_exp, jnp.asarray(e_pix), jnp.asarray(x_pix),
            jnp.asarray(valid))
    return args, dict(ww=ww, maxww=maxww, pw=pw, B=B, e_lo=e_lo,
                      x_pad=x_pad)


@pytest.mark.parametrize("dense_reads", [True, False])
def test_pallas_ladder_matches_xla_maps(rng, dense_reads):
    args, kw = _case(rng, n=300, B=40, ww=3, maxww=8, pw=1, npix=500,
                     dense_reads=dense_reads)
    res_x, *vals_x = escalation_packed_maps(*args, **kw)
    res_p, *vals_p = escalation_pallas(*args, **kw, interpret=True)
    res_x = np.asarray(res_x)
    res_p = np.asarray(res_p)
    np.testing.assert_array_equal(res_p, res_x)
    assert res_x.any(), "case degenerate: nothing resolved"
    if not dense_reads:
        assert not res_x.all(), "case degenerate: everything resolved"
    for vx, vp in zip(vals_x, vals_p):
        np.testing.assert_allclose(np.asarray(vp)[res_x],
                                   np.asarray(vx)[res_x],
                                   rtol=1e-5, atol=1e-4)


def test_pallas_ladder_empty_pixels(rng):
    args, kw = _case(rng, n=300, B=40, ww=3, maxww=8, pw=1, npix=64)
    args = args[:5] + (jnp.zeros(64, bool),)
    res_p, *vals_p = escalation_pallas(*args, **kw, interpret=True)
    assert not np.asarray(res_p).any()
