"""Fused multi-iteration ICE balancing as a single Pallas TPU kernel.

The jitted XLA path (ops/balance.py) dispatches one matvec per iteration and
materializes the marginal vector in HBM each time.  This kernel runs K whole
ICE iterations inside one ``pallas_call``:

  * the bias vector ``b`` and the running marginal live in VMEM scratch for
    the entire sweep, so the only HBM traffic per iteration is the single
    streaming read of the matrix tiles — the bandwidth lower bound;
  * TPU grid execution is sequential, so the grid
    ``(iters, row_tiles, col_tiles)`` carries scratch state across tiles and
    iterations: each (row, col) tile adds its partial matvec on the MXU, the
    last column tile closes the row stripe, and the last tile of an
    iteration performs the mean-normalize + bias update on-chip.

Bin filtering (min-nnz / MAD-max) and the convergence test stay in the XLA
wrapper: filters run once, and fixed blocks of K sweeps are cheaper than a
data-dependent while_loop.  ``ice_balance_pallas`` reproduces
``ops.balance.ice_balance`` semantics and matches it to float tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.balance import _zero_diags
from ..ops.masked import masked_median, valid_row_mask

TILE_R = 256
TILE_C = 2048


def _sweep_kernel(m_ref, b_in_ref, b_out_ref, stat_ref, marg_ref, b_ref,
                  acc_ref):
    it = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    n_i = pl.num_programs(1)
    n_j = pl.num_programs(2)

    @pl.when((it == 0) & (i == 0) & (j == 0))
    def _():
        b_ref[:] = b_in_ref[:]

    # Partial matvec of this (row, col) tile on the MXU.  bf16 tiles use the
    # MXU's native bf16 x bf16 -> f32 mode (b cast per tile; the bias itself
    # stays f32 in VMEM).
    col0 = j * TILE_C
    bcol = b_ref[0, pl.ds(col0, TILE_C)].reshape(-1, 1)
    # precision=HIGHEST: Mosaic's DEFAULT contracts f32 inputs at bf16
    # MXU precision, the exact condition ops/balance.py documents as
    # stalling the var<1e-5 convergence test — request fp32 contraction
    # for f32 tiles; bf16 tiles (fast mode) still use the native
    # bf16 x bf16 -> f32 mode.
    part = jnp.dot(m_ref[:], bcol.astype(m_ref.dtype),
                   preferred_element_type=jnp.float32,
                   precision=(jax.lax.Precision.HIGHEST
                              if m_ref.dtype == jnp.float32
                              else jax.lax.Precision.DEFAULT)).reshape(1, -1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    # Close the row stripe: marg_rows = (M @ b)_rows * b_rows.
    @pl.when(j == n_j - 1)
    def _():
        row0 = i * TILE_R
        marg_ref[0, pl.ds(row0, TILE_R)] = (
            acc_ref[0, :] * b_ref[0, pl.ds(row0, TILE_R)])

    # Close the iteration: normalize by the nonzero mean, update the bias.
    @pl.when((i == n_i - 1) & (j == n_j - 1))
    def _():
        marg = marg_ref[:]
        nz = (marg != 0).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(nz), 1.0)
        mean_nz = jnp.sum(marg) / cnt
        mean_nz = jnp.where(mean_nz != 0, mean_nz, 1.0)
        var = jnp.sum(nz * (marg - mean_nz) ** 2) / cnt
        margn = marg / mean_nz
        margn = jnp.where(margn == 0, 1.0, margn)
        b_ref[:] = b_ref[:] / margn
        stat_ref[0, 0] = var
        stat_ref[0, 1] = mean_nz

        @pl.when(it == pl.num_programs(0) - 1)
        def _():
            b_out_ref[:] = b_ref[:]


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def pallas_ice_sweeps(M0: jnp.ndarray, b0: jnp.ndarray, iters: int = 10,
                      interpret: bool = False):
    """Run ``iters`` ICE iterations on a pre-filtered matrix.

    M0 : [N, N] float32 or bfloat16 (2x HBM-bandwidth mode), ignored
         diagonals and dead rows already zeroed, N a multiple of 2048
    b0 : [1, N] float32 initial bias (0 at filtered bins)
    Returns (b [1,N], var, scale) after the sweep.
    """
    N = M0.shape[0]
    assert N % TILE_C == 0, f"N must be a multiple of {TILE_C}"
    n_i, n_j = N // TILE_R, N // TILE_C

    grid_spec = pl.GridSpec(
        grid=(iters, n_i, n_j),
        in_specs=[
            pl.BlockSpec((TILE_R, TILE_C), lambda it, i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b0 [1, N]
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b out [1, N]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # stats [1, 2] scalars
        ),
        scratch_shapes=[
            pltpu.VMEM((1, N), jnp.float32),       # marg
            pltpu.VMEM((1, N), jnp.float32),       # b
            pltpu.VMEM((1, TILE_R), jnp.float32),  # row-stripe accumulator
        ],
    )
    b_out, stats = pl.pallas_call(
        _sweep_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ),
        interpret=interpret,
    )(M0, b0)
    return b_out, stats[0, 0], stats[0, 1]


def ice_balance_pallas(M: jnp.ndarray, n, *, ignore_diags: int = 1,
                       mad_max: int = 5, min_nnz: int = 10,
                       min_count: int = 0, tol: float = 1e-5,
                       max_iters: int = 200, block: int = 10,
                       fast: bool = False, interpret: bool = False):
    """Drop-in ICE with the Pallas fused sweep (ops.balance.ice_balance
    parity).  Runs fixed blocks of ``block`` iterations until the variance
    of nonzero marginals converges.  ``fast=True`` streams the matrix as
    bfloat16 (half the HBM traffic per sweep; weights deviate <=1e-3 like
    ops.balance's fast mode), filters still computed in f32."""
    dtype = jnp.float32
    N = M.shape[0]
    valid = valid_row_mask(jnp.asarray(n), N)
    M0 = _zero_diags(M.astype(dtype), ignore_diags)
    M0 = jnp.where(valid[:, None] & valid[None, :], M0, 0.0)

    nnz = jnp.sum(M0 != 0, axis=1)
    marg0 = jnp.sum(M0, axis=1)
    keep = valid & (nnz >= min_nnz) & (marg0 >= min_count)
    if mad_max > 0:
        sel = keep & (marg0 > 0)
        logm = jnp.where(sel, jnp.log(jnp.maximum(marg0, 1e-30)), 0.0)
        med = masked_median(logm, sel)
        dev = masked_median(jnp.abs(logm - med), sel)
        keep = keep & (marg0 >= jnp.exp(med - mad_max * dev))
    b = jnp.where(keep, 1.0, 0.0).astype(dtype).reshape(1, N)
    if fast:
        M0 = M0.astype(jnp.bfloat16)

    var = np.inf
    scale = 1.0
    done = 0
    while done < max_iters and var >= tol:
        b, var_j, scale_j = pallas_ice_sweeps(M0, b, iters=block,
                                              interpret=interpret)
        var = float(var_j)
        scale = float(scale_j)
        done += block
    b = b.reshape(N)
    w = b / np.sqrt(scale if scale > 0 else 1.0)
    w = jnp.where(keep & (b != 0), w, jnp.nan)
    return w, {"var": var, "scale": scale, "iters": done,
               "converged": var < tol}
