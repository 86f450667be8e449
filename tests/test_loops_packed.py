"""Packed-band loop stencils: parity vs brute force and vs the full-matrix
escalation path."""

import numpy as np
import jax.numpy as jnp
import pytest

from hichap_master_tpu.models.loops import pcaller_chrom_coo, peaks_parameters
from hichap_master_tpu.ops.loops_kernel import oracle_region_sums
from hichap_master_tpu.ops.loops_packed import (
    anti_diagonal_prefix,
    donut_map,
    lowerleft_map,
    pack_coo,
    pack_margins,
)


def test_packed_maps_match_bruteforce(rng):
    n, B, w, pw, maxww = 80, 30, 5, 2, 20
    M = rng.poisson(2.0, (n, n)).astype(np.float32)
    M = np.triu(M)  # upper band semantics
    # zero outside band
    for i in range(n):
        for j in range(n):
            if not (0 <= j - i < B):
                M[i, j] = 0
    iu, ju = np.nonzero(M)
    e_lo, _, x_pad = pack_margins(maxww)
    Xp = n + 2 * x_pad
    D = pack_coo(jnp.asarray(iu.astype(np.int32)),
                 jnp.asarray(ju.astype(np.int32)),
                 jnp.asarray(M[iu, ju]), B, Xp, e_lo, x_pad)
    W = anti_diagonal_prefix(D)
    K = np.asarray(donut_map(W, w, pw))
    Y = np.asarray(lowerleft_map(W, w, pw))
    for x, e in [(10, 8), (0, 3), (70, 9), (40, 0), (5, 29)]:
        ok, oy = oracle_region_sums(M.astype(float), x, x + e, w, pw)
        assert K[e + e_lo, x + x_pad] == pytest.approx(ok), (x, e)
        assert Y[e + e_lo, x + x_pad] == pytest.approx(oy), (x, e)


def _loop_matrix(rng, n, loops):
    i = np.arange(n)
    d = np.abs(np.subtract.outer(i, i)).astype(float)
    lam = 40.0 / (1 + d) + 0.2
    for (x, y) in loops:
        lam[max(x - 1, 0): x + 2, max(y - 1, 0): y + 2] *= 3
        lam[x, y] *= 6
    M = rng.poisson(lam).astype(float)
    return np.triu(M) + np.triu(M, 1).T


@pytest.mark.slow
def test_packed_pcaller_matches_full(rng):
    n, res = 150, 40_000
    M = _loop_matrix(rng, n, [(30, 55), (80, 110)])
    iu, ju = np.nonzero(np.triu(M))
    rows = iu.astype(np.int32)
    cols = ju.astype(np.int32)
    vals = M[iu, ju].astype(np.float64)
    weights = np.ones(n)
    params = peaks_parameters(res)

    d_full, l_full = pcaller_chrom_coo(rows, cols, vals, weights, n, res,
                                       params, packed=False)
    d_pack, l_pack = pcaller_chrom_coo(rows, cols, vals, weights, n, res,
                                       params, packed=True)
    assert set(d_full) == set(d_pack)
    for pos in d_full:
        np.testing.assert_allclose(d_pack[pos], d_full[pos], rtol=1e-4)
        np.testing.assert_allclose(l_pack[pos], l_full[pos], rtol=1e-4)
    assert len(d_full) > 0
