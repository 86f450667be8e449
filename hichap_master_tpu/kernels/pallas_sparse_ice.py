"""Fused symmetric block-sparse marginal (matvec) as a Pallas TPU kernel.

STATUS: parity-correct but measured SLOWER than the XLA formulation it was
meant to beat — kept as an opt-in experiment (``reduce="pallas"`` /
``HICHAP_PALLAS_ICE=1``), default off.  Record of what was tried and why
it lost, so the next attempt doesn't repeat it:

  * Hypothesis: ``ops.sparse.block_sym_matvec``'s XLA form reads the tile
    tensor twice (once per triangle contribution) and pays a ~190 MB/iter
    one-hot reduction operand at hg19 10 kb, so a single streaming pass
    with in-VMEM one-hots should win.  In fact XLA fuses both [K,T,T]
    contractions into one tile stream and runs the one-hot reduction on
    the MXU at full tilt: amortized over a 100-deep on-device chain the
    XLA marginal measures 631-805/s at hg19 10 kb (the older "280-360
    iters/s" PERF numbers were dispatch round-trip noise from 50-iter
    samples over the tunnel, not device time).
  * Revision 1 (serialized per-tile fori_loop row gathers + read-modify-
    write scatters, ~19k dependent dynamic-slice ops per marginal): 196/s.
  * Revision 2 (this file): gather as ONE [R,2G]x[R,T] dim-0-contracted
    one-hot matmul, scatter as ONE [R,2G]x[2G,T] one-hot matmul, one-hots
    built from iota comparisons in VMEM, tiles streamed once: 221/s at
    G=32, 264/s at G=128.  The residual costs are structural: the batched
    [G,T,T]x[G,T] matvec contraction is a VPU lane-axis reduction (the MXU
    alternative wastes 127/128 lanes on N=1, and Mosaic only offers
    DEFAULT/HIGHEST dot precision — HIGHEST's 6-pass f32 emulation makes
    the one-hot matmuls ~0.7-1.4 ms/iter on their own), and none of it
    overlaps the 593 MB tile DMA as well as XLA's fusion does.
  * Conclusion: the XLA path is within ~2x of the single-stream HBM bound
    (593 MB @ ~820 GB/s = 1380/s ceiling) and the Pallas rewrite cannot
    close that gap without a native bf16x3 dot mode; revisit if Mosaic
    grows ``Precision.HIGH`` support.

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


def _marginal_kernel(brow_ref, bcol_ref, tiles_ref, x_ref, y_ref, *,
                     G: int, R: int):
    kg = pl.program_id(0)

    @pl.when(kg == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    # brow/bcol are fully VMEM-resident ([n_g, G] int32, ~40 KB each at
    # hg19 scale); dynamic-slice this group's row
    br = brow_ref[pl.ds(kg, 1), :]  # [1, G] int32
    bc = bcol_ref[pl.ds(kg, 1), :]

    hp = jax.lax.Precision.HIGHEST
    # sublane index r broadcast across 2G lanes — shared by both one-hots
    sub_r = jax.lax.broadcasted_iota(jnp.int32, (R, 2 * G), 0)

    # --- gather: xg[2G, T] = onehot([bcol; brow]).T[2G, R] @ x[R, T] ------
    # one-hot entries are exact 0/1, so the HIGHEST-precision matmul IS a
    # row gather (exact up to the f32 multi-pass split, ~2^-45 relative);
    # built in [R, 2G] orientation (ids [1, 2G] broadcasts along sublanes)
    # and contracted over dim 0 — no in-kernel transpose needed
    ids = jnp.concatenate([bc, br], axis=1)  # [1, 2G]
    oh_gather = (sub_r == ids).astype(jnp.float32)  # [R, 2G]
    xg = jax.lax.dot_general(oh_gather, x_ref[:], (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=hp)  # [2G, T]
    xc = xg[:G]   # x[bcol[g]]
    xr = xg[G:]   # x[brow[g]]

    # --- both triangle contributions in one pass over the tile block ------
    t = tiles_ref[:].astype(jnp.float32)
    cr = jnp.sum(t * xc[:, None, :], axis=2)  # [G, T] row contribution
    cc = jnp.sum(t * xr[:, :, None], axis=1)  # [G, T] transposed (column)

    # --- scatter: y += onehot_s[R, 2G] @ [cr; cc*offdiag][2G, T] ----------
    offdiag = (br != bc)
    segs = jnp.concatenate([br, jnp.where(offdiag, bc, R)], axis=1)  # [1,2G]
    oh_scatter = (sub_r == segs).astype(jnp.float32)  # [R, 2G]
    contrib = jnp.concatenate([cr, cc], axis=0)  # [2G, T]
    y_ref[:] += jax.lax.dot_general(oh_scatter, contrib,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=hp)


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
    n_g = Kp // G

    grid_spec = pl.GridSpec(
        grid=(n_g,),
        in_specs=[
            pl.BlockSpec((n_g, G), lambda kg: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_g, G), lambda kg: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, T, T), lambda kg: (kg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, T), lambda kg: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, T), lambda kg: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    y = pl.pallas_call(
        functools.partial(_marginal_kernel, G=G, R=R),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, T), jnp.float32),
        # [G,T,T] double-buffered tile blocks + x/y residents + the f32
        # broadcast temporaries and [R,2G]/[2G,R] one-hots: ~14 MB at G=32
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(brow.astype(jnp.int32).reshape(n_g, G),
      bcol.astype(jnp.int32).reshape(n_g, G),
      tiles, b.astype(jnp.float32).reshape(R, T))
    return y.reshape(R * T)
