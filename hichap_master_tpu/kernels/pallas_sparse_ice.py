"""Fused symmetric block-sparse marginal (matvec) as a Pallas TPU kernel.

The XLA formulation of the genome-wide block-sparse ICE marginal
(``ops.sparse.block_sym_matvec``) dispatches two batched [K,T,T]x[K,T]
contractions plus two one-hot [R,K]@[K,T] block-row reductions — the tile
tensor is streamed from HBM twice (once per triangle contribution) and the
f32 one-hot operand adds ~190 MB/iteration at hg19 10 kb scale, capping the
measured rate at ~280-340 iters/s (PERF.md).  This kernel computes the whole
marginal in ONE streaming pass over the tiles:

  * the bias vector ``x`` ([R, T], ~1.2 MB at hg19 10 kb) and the output
    marginal accumulator ``y`` live in VMEM for the entire pass;
  * the grid walks tile groups of G; each step DMAs one [G, T, T] block
    (double-buffered by the Pallas pipeline), gathers the per-tile x rows
    by block coordinate (scalar-prefetched ``brow``/``bcol``), forms both
    triangle contributions as VPU multiply+reduce (f32 — no MXU bf16
    default-precision trap, see ops/balance.py), and accumulates them into
    ``y``'s block rows in place;
  * per-iteration HBM traffic is the single tile stream (593 MB f32 /
    297 MB bf16 at hg19 10 kb) plus ~2.5 MB of bias/marginal — the
    bandwidth lower bound for this layout.

Semantics are identical to ``block_sym_matvec`` (diagonal tiles stored
mirrored-full contribute once; off-diagonal tiles contribute their
transpose to the column block row), so ``ops.sparse.sparse_ice_balance``
can swap it in as ``reduce="pallas"`` with bit-compatible filter and
convergence logic.  The reference outsources this entire computation to
``cooler balance`` on the host CPU (HiCHap/matrixBuilding.py:699-714).

Like every Mosaic kernel: interpret-mode parity runs on CPU in the test
suite; the compiled path is exercised by the TPU-gated tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _marginal_kernel(brow_ref, bcol_ref, tiles_ref, x_ref, y_ref,
                     xc_ref, xr_ref, crs_ref, ccs_ref, *, G: int):
    kg = pl.program_id(0)

    @pl.when(kg == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    base = kg * G

    def gather(g, carry):
        br = brow_ref[base + g]
        bc = bcol_ref[base + g]
        xc_ref[g, :] = x_ref[bc, :]
        xr_ref[g, :] = x_ref[br, :]
        return carry

    jax.lax.fori_loop(0, G, gather, 0)

    t = tiles_ref[:].astype(jnp.float32)
    # row contribution: cr[g, i] = sum_j t[g, i, j] * x[bcol[g], j]
    crs_ref[:] = jnp.sum(t * xc_ref[:][:, None, :], axis=2)
    # transposed (column) contribution: cc[g, j] = sum_i t[g,i,j] * x[brow,i]
    ccs_ref[:] = jnp.sum(t * xr_ref[:][:, :, None], axis=1)

    def scatter(g, carry):
        br = brow_ref[base + g]
        bc = bcol_ref[base + g]
        y_ref[br, :] += crs_ref[g, :]

        @pl.when(br != bc)
        def _():
            y_ref[bc, :] += ccs_ref[g, :]

        return carry

    jax.lax.fori_loop(0, G, scatter, 0)


@functools.partial(jax.jit, static_argnames=("R", "T", "G", "interpret"))
def block_sym_matvec_pallas(tiles: jnp.ndarray, brow: jnp.ndarray,
                            bcol: jnp.ndarray, b: jnp.ndarray, *,
                            R: int, T: int, G: int = 32,
                            interpret: bool = False) -> jnp.ndarray:
    """y = M @ b for the symmetric block layout of ``ops.sparse`` — one
    fused streaming pass over the tiles.

    tiles : [K, T, T] float32 or bfloat16 (cast to f32 on-chip; bf16 halves
            the HBM stream, the accumulate stays f32)
    brow, bcol : [K] int32 block coordinates, brow <= bcol
    b : [R*T] float32
    """
    K = tiles.shape[0]
    Kp = ((K + G - 1) // G) * G
    if Kp != K:
        # zero tiles at block (0, 0) contribute nothing
        tiles = jnp.pad(tiles, ((0, Kp - K), (0, 0), (0, 0)))
        brow = jnp.pad(brow, (0, Kp - K))
        bcol = jnp.pad(bcol, (0, Kp - K))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Kp // G,),
        in_specs=[
            pl.BlockSpec((G, T, T), lambda kg, br, bc: (kg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, T), lambda kg, br, bc: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, T), lambda kg, br, bc: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G, T), jnp.float32),  # gathered x[bcol]
            pltpu.VMEM((G, T), jnp.float32),  # gathered x[brow]
            pltpu.VMEM((G, T), jnp.float32),  # row contributions
            pltpu.VMEM((G, T), jnp.float32),  # column contributions
        ],
    )
    y = pl.pallas_call(
        functools.partial(_marginal_kernel, G=G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, T), jnp.float32),
        # [G,T,T] double-buffered tile blocks + x/y residents + scratch:
        # ~6.5 MB at G=32 — under the default limit, but the 3-D f32
        # broadcast temporaries push past it at G=64; give headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(brow.astype(jnp.int32), bcol.astype(jnp.int32),
      tiles, b.astype(jnp.float32).reshape(R, T))
    return y.reshape(R * T)
