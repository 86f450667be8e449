"""Distance-decay expected curves and O/E transforms (compartment core).

Re-derivation of HiCHap/StructureFind.py:201-299:

* ``distance_decay`` — per-|i-j| mean contact, where sparse entries whose
  *column* is a gap bin are excluded from the numerator
  (StructureFind.py:235-244 masks on ``bin2`` only), and the denominator is
  the gap-adjusted count of ordered pairs at each distance
  (StructureFind.py:255-268).  The reference builds its sparse list from
  ``np.nonzero`` of the symmetric matrix, so both (i,j) and (j,i) count.
* default gap rule when none is supplied: column coverage <= 0.05
  (StructureFind.py:216-221).
* ``oe_matrix`` — O/E with the decay's zeros replaced by its smallest
  nonzero value (StructureFind.py:320-329).
* ``oe_matrix_sliding`` — Ren-lab sliding-window variant
  (StructureFind.py:274-299): interior cells use 3x3 observed sums over a
  5-coefficient expected sum; edge cells fall back to plain O/E.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .masked import masked_min, valid_row_mask


def default_compartment_gap(M: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Column coverage <= 5% => gap (StructureFind.py:216-221)."""
    N = M.shape[0]
    valid = valid_row_mask(n, N)
    cov = jnp.sum(M != 0, axis=0) / jnp.maximum(n, 1)
    return ((cov <= 0.05) | ~valid)


@jax.jit
def distance_decay(M: jnp.ndarray, gap: jnp.ndarray, n: jnp.ndarray):
    """Gap-aware expected-by-distance curve.  Returns [N] (index = distance).

    ``gap`` is a boolean mask (True = gap bin); entries in gap *columns* are
    excluded from the numerator, and pair counts shrink by the gap bins that
    could participate at each distance.
    """
    N = M.shape[0]
    dtype = M.dtype
    valid = valid_row_mask(n, N)
    keep = valid[:, None] & valid[None, :] & ~gap[None, :]
    W = jnp.where(keep, M, 0.0)
    i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    d = jnp.abs(i - j)
    sums = jnp.zeros((N,), dtype).at[d.ravel()].add(W.ravel())

    # Gap-count prefix sums over the true range.
    g = (gap & valid).astype(jnp.int32)
    g_le = jnp.cumsum(g)  # g_le[k] = #gaps <= k
    n_gap = g_le[-1]
    dist = jnp.arange(N)

    def le(k):
        k = jnp.clip(k, -1, N - 1)
        return jnp.where(k >= 0, g_le[jnp.maximum(k, 0)], 0)

    pair0 = (n - n_gap).astype(dtype)
    paird = (2 * (n - dist) - le(n - 1 - dist) - (n_gap - le(dist - 1))).astype(dtype)
    pairs = jnp.where(dist == 0, pair0, paird)
    out = jnp.where(pairs > 0, sums / pairs, sums)
    return jnp.where(dist < n, out, 0.0)


@jax.jit
def oe_matrix(M: jnp.ndarray, decay: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """O/E where observed != 0; decay zeros -> min nonzero decay."""
    N = M.shape[0]
    valid_d = (jnp.arange(N) < n) & (decay != 0)
    dmin = masked_min(decay, valid_d)
    dec = jnp.where(decay == 0, dmin, decay)
    i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    e = dec[jnp.abs(i - j)]
    return jnp.where(M != 0, M / e, 0.0)


@functools.partial(jax.jit, static_argnames=("step",))
def oe_matrix_sliding(M: jnp.ndarray, decay: jnp.ndarray, n: jnp.ndarray,
                      step: int) -> jnp.ndarray:
    """Sliding-approach O/E (StructureFind.py:274-299), step = window//res//2."""
    N = M.shape[0]
    valid_d = (jnp.arange(N) < n) & (decay != 0)
    dmin = masked_min(decay, valid_d)
    dec = jnp.where(decay == 0, dmin, decay)

    i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    ad = jnp.abs(i - j)
    plain = M / dec[ad]

    if step <= 0:
        return plain

    # 3x3 observed box sum via shifted adds on a zero-padded matrix.
    P = jnp.pad(M, step)
    o_sum = jnp.zeros_like(M)
    for di in range(-step, step + 1):
        for dj in range(-step, step + 1):
            o_sum = o_sum + jax.lax.dynamic_slice(
                P, (step + di, step + dj), (N, N))
    dm1 = dec[jnp.abs(i - j - 1)]
    dp1 = dec[jnp.abs(i - j + 1)]
    dm2 = dec[jnp.abs(i - j - 2)]
    dp2 = dec[jnp.abs(i - j + 2)]
    e_sum = 3 * dec[ad] + 2 * dm1 + 2 * dp1 + dm2 + dp2
    windowed = o_sum / e_sum

    edge = (i < step) | (j < step) | (i > n - step - 1) | (j > n - step - 1)
    return jnp.where(edge, plain, windowed)


@jax.jit
def correlation_matrix(X: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Column-wise Pearson correlation over the first ``n`` rows (padded
    [N, N] in/out).  ``np.corrcoef(X, rowvar=False)`` parity on the true
    block; NaN -> 0, inf -> 1 as the reference does (StructureFind.py:335-337)."""
    N = X.shape[0]
    valid = valid_row_mask(n, N).astype(X.dtype)
    cnt = jnp.maximum(jnp.sum(valid), 1.0)
    Xv = X * valid[:, None]
    mu = jnp.sum(Xv, axis=0) / cnt
    Xc = (X - mu[None, :]) * valid[:, None]
    cov = jnp.dot(Xc.T, Xc, precision=jax.lax.Precision.HIGHEST)
    sd = jnp.sqrt(jnp.diag(cov))
    denom = sd[:, None] * sd[None, :]
    corr = cov / denom
    corr = jnp.where(jnp.isnan(corr), 0.0, corr)
    corr = jnp.where(jnp.isinf(corr), 1.0, corr)
    return corr
