"""Inter-chromosomal imputation of single-side-assigned haplotype contacts.

Method (HiCHap/matrixBuilding.py:721-738, 1268-1494; credited there to Tan
et al., *Science* single-cell diploid Hi-C): for a contact with only one mate
haplotype-assigned, vote between the two candidate target bins (same-haplotype
vs cross-haplotype chromosome copy) by comparing contact counts of the
*un-imputed* genome-wide matrix inside a disk neighborhood around each
candidate; accept when the winning count ≥ ``min_count`` and its share of the
two-candidate total exceeds ``ratio``.

Disk definition preserved exactly, including the reference's off-center
quirk: indices (i, j) of the (2L+1)^2 window with
``sqrt((i-(L+1))^2 + (j-(L+1))^2) < sqrt(L)``, L = region // res
(matrixBuilding.py:721-732).

Two reference bugs are FIXED here (see DIVERGENCES.md):
  * the P_P R1 branch reads a stale neighborhood and swaps its write targets
    (matrixBuilding.py:1439-1453);
  * the R2 branches bin each position against the *other* mate's chromosome
    offset (matrixBuilding.py:1344-1346, 1458-1460).
The corrected rule is symmetric: the known mate's bin is the row, the
same-haplotype candidate is preferred, the cross candidate second.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def disk_offsets(L: int) -> Tuple[np.ndarray, np.ndarray]:
    """Relative (row, col) offsets of the imputation disk for region size L.

    Reference center is (L+1, L+1) in the (2L+1)x(2L+1) window
    (matrixBuilding.py:724), i.e. one below/right of the true center; offsets
    here are window indices minus L so they apply directly to the target bin.
    """
    # vectorized scan of the (2L+1)^2 window (the Python double loop was
    # ~25 s at L=1000, i.e. 10 Mb regions at 10 kb); row-major order kept
    # identical to the original loop
    i = np.arange(2 * L + 1, dtype=np.int64)
    d2 = (i - (L + 1)) ** 2
    mask = (d2[:, None] + d2[None, :]) < L  # sqrt(x)<sqrt(L) <=> x<L, ints
    di, dj = np.nonzero(mask)
    return (di - L).astype(np.int32), (dj - L).astype(np.int32)


def _disk_sum(U, rows, cols, di, dj):
    """[K] sums of U over the disk around each (row, col)."""
    rr = rows[:, None] + di[None, :]
    cc = cols[:, None] + dj[None, :]
    return jnp.sum(U[rr, cc], axis=1)


@functools.partial(jax.jit, static_argnames=("L",), donate_argnums=(0,))
def impute_inter_chunk(imp: jnp.ndarray, U: jnp.ndarray,
                       row_known: jnp.ndarray, col_same: jnp.ndarray,
                       col_cross: jnp.ndarray, valid: jnp.ndarray,
                       di: jnp.ndarray, dj: jnp.ndarray, L: int,
                       min_count: float, ratio: float) -> jnp.ndarray:
    """Vote + scatter one chunk of inter-chromosome single-side contacts.

    imp       : genome-wide Imputated accumulator [S, S] (donated)
    U         : genome-wide UnImputated matrix [S, S] (read-only)
    row_known : bin of the haplotype-assigned mate
    col_same  : candidate bin on the same haplotype
    col_cross : candidate bin on the other haplotype
    """
    S = U.shape[0]
    inb = (
        valid
        & (row_known >= L) & (row_known + L + 1 <= S)
        & (col_same >= L) & (col_same + L + 1 <= S)
        & (col_cross >= L) & (col_cross + L + 1 <= S)
    )
    r = jnp.where(inb, row_known, L)
    cs = jnp.where(inb, col_same, L)
    cc = jnp.where(inb, col_cross, L)

    same = _disk_sum(U, r, cs, di, dj)
    cross = _disk_sum(U, r, cc, di, dj)
    tot = same + cross
    share_same = jnp.where(tot > 0, same / tot, 0.0)
    share_cross = jnp.where(tot > 0, cross / tot, 0.0)

    pick_same = inb & (same >= min_count) & (share_same > ratio)
    pick_cross = inb & ~pick_same & (cross >= min_count) & (share_cross > ratio)

    tgt = jnp.where(pick_same, cs, cc)
    hit = pick_same | pick_cross
    rr = jnp.where(hit, r, 0)
    tt = jnp.where(hit, tgt, 0)
    return imp.at[rr, tt].add(hit.astype(imp.dtype))


def impute_inter_oracle(imp: np.ndarray, U: np.ndarray, rows, cols_same,
                        cols_cross, L: int, min_count: float, ratio: float):
    """Straight-line numpy oracle of the (corrected) vote, for tests."""
    di, dj = disk_offsets(L)
    S = U.shape[0]
    out = imp.copy()
    for r, cs, cc in zip(rows, cols_same, cols_cross):
        if min(r, cs, cc) < L or max(r, cs, cc) + L + 1 > S:
            continue
        same = U[r + di, cs + dj].sum()
        cross = U[r + di, cc + dj].sum()
        tot = same + cross
        if same >= min_count and tot > 0 and same / tot > ratio:
            out[r, cs] += 1
        elif cross >= min_count and tot > 0 and cross / tot > ratio:
            out[r, cc] += 1
    return out
