"""Contact binning as jitted scatter-adds over fixed-size chunks.

The reference increments dense numpy matrices one bed line at a time
(HiCHap/matrixBuilding.py:567-603, 793-854).  Here contacts arrive as
columnar int32 chunks (parsed host-side, see io/bedio.py) and are folded
into device-resident accumulators with XLA scatter-adds:

  * genome-wide matrix [S, S]: ``bin = pos // res + chrom_offset``;
    symmetric increment, diagonal counted once (matrixBuilding.py:588-592);
  * per-chromosome batch [C, N, N]: intra contacts only.

Chunks are padded to a fixed length with a validity mask so a single
compiled executable serves the whole stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("res",), donate_argnums=(0,))
def bin_genomewide(acc: jnp.ndarray, c1: jnp.ndarray, p1: jnp.ndarray,
                   c2: jnp.ndarray, p2: jnp.ndarray, offsets: jnp.ndarray,
                   valid: jnp.ndarray, res: int) -> jnp.ndarray:
    """Accumulate a contact chunk into the genome-wide matrix.

    acc     : [S, S] accumulator (donated)
    c1, c2  : chrom indices into ``offsets`` (-1 allowed when invalid)
    p1, p2  : positions (bp)
    offsets : [n_chroms] genome-wide start bin per chromosome
    valid   : bool mask of live rows in the chunk
    """
    S = acc.shape[0]
    ci1 = jnp.clip(c1, 0, offsets.shape[0] - 1)
    ci2 = jnp.clip(c2, 0, offsets.shape[0] - 1)
    b1 = p1 // res + offsets[ci1]
    b2 = p2 // res + offsets[ci2]
    # negative bins (malformed negative positions) would WRAP NumPy-style
    # into the previous chromosome's tail — only >= S indices drop; treat
    # them as invalid like the sparse host accumulator does
    valid = valid & (b1 >= 0) & (b2 >= 0)
    # Invalid rows scatter zero at (0, 0).
    b1 = jnp.where(valid, b1, 0)
    b2 = jnp.where(valid, b2, 0)
    inc = valid.astype(acc.dtype)
    acc = acc.at[b1, b2].add(inc)
    acc = acc.at[b2, b1].add(jnp.where(b1 != b2, inc, 0))
    return acc


@functools.partial(jax.jit, donate_argnums=(0,))
def bin_genomewide_bins(acc: jnp.ndarray, b1: jnp.ndarray, b2: jnp.ndarray,
                        valid: jnp.ndarray) -> jnp.ndarray:
    """``bin_genomewide`` from precomputed genome-wide bins (symmetric
    increment, diagonal once).  Used by the streaming haplotype builder
    where the two sides carry distinct offset tables (M/P halves)."""
    valid = valid & (b1 >= 0) & (b2 >= 0)  # no NumPy-style negative wrap
    b1 = jnp.where(valid, b1, 0)
    b2 = jnp.where(valid, b2, 0)
    inc = valid.astype(acc.dtype)
    acc = acc.at[b1, b2].add(inc)
    acc = acc.at[b2, b1].add(jnp.where(b1 != b2, inc, 0))
    return acc


@functools.partial(jax.jit, donate_argnums=(0,))
def bin_genomewide_single_triangle_bins(acc: jnp.ndarray, r: jnp.ndarray,
                                        c: jnp.ndarray,
                                        valid: jnp.ndarray) -> jnp.ndarray:
    """Literal single-triangle (row, col) increments from precomputed bins
    (the haplotype single-side rule, matrixBuilding.py:1295-1301)."""
    valid = valid & (r >= 0) & (c >= 0)  # no NumPy-style negative wrap
    r = jnp.where(valid, r, 0)
    c = jnp.where(valid, c, 0)
    return acc.at[r, c].add(valid.astype(acc.dtype))


@functools.partial(jax.jit, static_argnames=("res",), donate_argnums=(0,))
def bin_intra(acc: jnp.ndarray, c1: jnp.ndarray, p1: jnp.ndarray,
              c2: jnp.ndarray, p2: jnp.ndarray, valid: jnp.ndarray,
              res: int) -> jnp.ndarray:
    """Accumulate intra-chromosome contacts into the [C, N, N] batch."""
    intra = valid & (c1 == c2) & (p1 >= 0) & (p2 >= 0)
    ci = jnp.where(intra, c1, 0)
    b1 = jnp.where(intra, p1 // res, 0)
    b2 = jnp.where(intra, p2 // res, 0)
    inc = intra.astype(acc.dtype)
    acc = acc.at[ci, b1, b2].add(inc)
    acc = acc.at[ci, b2, b1].add(jnp.where(b1 != b2, inc, 0))
    return acc


@functools.partial(jax.jit, static_argnames=("res",), donate_argnums=(0,))
def bin_intra_single_side(acc: jnp.ndarray, c1: jnp.ndarray, p1: jnp.ndarray,
                          c2: jnp.ndarray, p2: jnp.ndarray, is_r1: jnp.ndarray,
                          valid: jnp.ndarray, res: int) -> jnp.ndarray:
    """Single-side (R1/R2-tagged) intra contacts: R1 adds to [b1, b2] only,
    R2 to [b2, b1] only (matrixBuilding.py:1295-1301) — one triangle each;
    symmetrization happens later in the correction step."""
    intra = valid & (c1 == c2) & (p1 >= 0) & (p2 >= 0)
    ci = jnp.where(intra, c1, 0)
    b1 = jnp.where(intra, p1 // res, 0)
    b2 = jnp.where(intra, p2 // res, 0)
    r = jnp.where(is_r1, b1, b2)
    c = jnp.where(is_r1, b2, b1)
    return acc.at[ci, r, c].add(intra.astype(acc.dtype))


# ------------------------------------------------------------ host driver
def pad_chunk(arrs, chunk: int):
    """Pad columnar arrays to ``chunk`` length; returns padded + valid mask."""
    n = len(arrs[0])
    valid = np.zeros(chunk, dtype=bool)
    valid[:n] = True
    out = []
    for a in arrs:
        p = np.zeros(chunk, dtype=a.dtype)
        p[:n] = a
        out.append(p)
    return out, valid


def stream_chunks(arrs, chunk: int):
    """Yield fixed-size padded chunks (+mask) from columnar arrays."""
    n = len(arrs[0])
    for s in range(0, max(n, 1), chunk):
        sl = [a[s : s + chunk] for a in arrs]
        if len(sl[0]) == 0:
            break
        padded, valid = pad_chunk(sl, chunk)
        yield padded, valid
