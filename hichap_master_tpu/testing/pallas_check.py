"""Compiled-mode (Mosaic) parity check for the fused Pallas escalation.

The CPU suite exercises ``escalation_pallas`` in interpret mode only
(tests/test_pallas_escalation.py); the four documented Mosaic-lowering
pitfalls (kernels/pallas_escalation.py) can therefore only regress
silently off-chip.  This module is the on-chip gate: it compiles the real
kernel and asserts exact resolved-pixel parity with the XLA map-space
path.  Run via ``python -m hichap_master_tpu.testing.pallas_check`` on a
TPU backend, or through ``tests/test_pallas_tpu.py`` (auto-skipped
off-chip, opt-in with HICHAP_TPU_TESTS=1).
"""

from __future__ import annotations

import numpy as np


def pallas_case(rng, n, B, ww, maxww, pw, npix, dense_reads=False):
    """Synthetic packed-band escalation inputs (mirrors the CPU test's
    bimodal case so the <10% stopping rule actually truncates)."""
    import jax.numpy as jnp

    from ..ops.loops_packed import pack_coo, pack_margins

    e_lo, _e_hi, x_pad = pack_margins(maxww)
    Xp = n + 2 * x_pad + 7  # deliberately unaligned
    nnz = 4 * n
    rows = rng.integers(0, n, nnz)
    offs = rng.integers(0, B, nnz)
    cols = np.minimum(rows + offs, n - 1)
    if dense_reads:
        vals = rng.poisson(30.0, nnz).astype(np.float32)
    else:
        strong = rows % 5 == 0
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


def run_parity(dense_reads: bool, scale: int = 1) -> None:
    import jax

    from ..kernels.pallas_escalation import escalation_pallas
    from ..ops.loops_packed import escalation_packed_maps

    assert jax.default_backend() == "tpu", (
        f"compiled Mosaic parity needs a TPU backend, got "
        f"{jax.default_backend()}")
    rng = np.random.default_rng(5)
    args, kw = pallas_case(rng, n=1024 * scale, B=64, ww=3, maxww=10, pw=1,
                           npix=2048 * scale, dense_reads=dense_reads)
    res_x, *vals_x = escalation_packed_maps(*args, **kw)
    res_p, *vals_p = escalation_pallas(*args, **kw)  # compiled, not interpret
    res_x = np.asarray(res_x)
    res_p = np.asarray(res_p)
    np.testing.assert_array_equal(res_p, res_x)
    assert res_x.any(), "case degenerate: nothing resolved"
    for vx, vp in zip(vals_x, vals_p):
        np.testing.assert_allclose(np.asarray(vp)[res_x],
                                   np.asarray(vx)[res_x],
                                   rtol=1e-5, atol=1e-4)


def run_sparse_ice_parity() -> None:
    """Compiled parity of the fused block-sparse marginal kernel and the
    reduce="pallas" balancing path against the XLA onehot formulation."""
    import jax
    import jax.numpy as jnp

    from ..kernels.pallas_sparse_ice import block_sym_matvec_pallas
    from ..ops.sparse import (block_sym_matvec, blocks_from_coo,
                              sparse_ice_balance)

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(11)
    n, T = 1500, 128
    nnz = 40_000
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, n, nnz)
    rows, cols = np.minimum(r, c), np.maximum(r, c)
    vals = rng.poisson(4.0, nnz).astype(np.float32) + 0.5
    bm = blocks_from_coo(rows, cols, vals, n, T)
    tiles = jnp.asarray(bm.tiles)
    brow = jnp.asarray(bm.brow)
    bcol = jnp.asarray(bm.bcol)
    b = jnp.asarray(rng.random(bm.R * T).astype(np.float32))

    y_x = np.asarray(block_sym_matvec(tiles, brow, bcol, b, R=bm.R, T=T,
                                      reduce="onehot"))
    y_p = np.asarray(block_sym_matvec_pallas(tiles, brow, bcol, b,
                                             R=bm.R, T=T))
    np.testing.assert_allclose(y_p, y_x, rtol=1e-5, atol=1e-3)

    w_x, st_x = sparse_ice_balance(tiles, brow, bcol, jnp.asarray(n),
                                   R=bm.R, T=T, reduce="onehot")
    w_p, st_p = sparse_ice_balance(tiles, brow, bcol, jnp.asarray(n),
                                   R=bm.R, T=T, reduce="pallas")
    w_x, w_p = np.asarray(w_x), np.asarray(w_p)
    np.testing.assert_array_equal(np.isnan(w_x), np.isnan(w_p))
    m = ~np.isnan(w_x)
    np.testing.assert_allclose(w_p[m], w_x[m], rtol=1e-4)
    assert int(np.asarray(st_p["iters"])) > 0


def main() -> None:
    import os

    import jax

    # persistent compile cache: the tunneled remote compile costs minutes
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    for dense_reads in (True, False):
        run_parity(dense_reads)
    run_sparse_ice_parity()
    print("PALLAS_PARITY_OK")


if __name__ == "__main__":
    main()
