"""Directionality index, vectorized.

Spec: HiCHap/StructureFind.py:804-839.  For bin j with window w (bins):
``up = M[j-w:j, j]``, ``down = M[j+1:j+w+1, j]``; the *ttest* statistic is
``(mean(down)-mean(up)) / sqrt(sum((up-mu_u)^2)/(w(w-1)) + sum((down-mu_d)^2)/(w(w-1)))``
and the *chitest* statistic the signed chi-square vs the balanced
expectation.  DI is 0 on gap bins and within w of either end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _diag_bands(M: jnp.ndarray, w: int):
    """up[k-1, j] = M[j-k, j];  down[k-1, j] = M[j+k, j]  (k = 1..w)."""
    N = M.shape[0]
    ups, downs = [], []
    for k in range(1, w + 1):
        sup = jnp.diagonal(M, offset=k)          # M[i, i+k], j = i+k
        ups.append(jnp.pad(sup, (k, 0)))
        sdn = jnp.diagonal(M, offset=-k)         # M[i+k, i], j = i
        downs.append(jnp.pad(sdn, (0, k)))
    return jnp.stack(ups), jnp.stack(downs)


def _di_from_bands(up: jnp.ndarray, down: jnp.ndarray, gap: jnp.ndarray,
                   n: jnp.ndarray, test_type: str) -> jnp.ndarray:
    N = up.shape[1]
    w = up.shape[0]
    j = jnp.arange(N)

    if test_type == "ttest":
        up_mean = jnp.mean(up, axis=0)
        down_mean = jnp.mean(down, axis=0)
        scale = up.shape[0] * (up.shape[0] - 1)
        up_den = jnp.sum((up - up_mean) ** 2, axis=0) / scale
        down_den = jnp.sum((down - down_mean) ** 2, axis=0) / scale
        denom = jnp.sqrt(up_den + down_den)
        di = jnp.where(denom != 0, (down_mean - up_mean) / denom, 0.0)
    elif test_type == "chitest":
        us = jnp.sum(up, axis=0)
        ds = jnp.sum(down, axis=0)
        e = (us + ds) / 2.0
        stat = (us - e) ** 2 / jnp.where(e != 0, e, 1.0) + \
               (ds - e) ** 2 / jnp.where(e != 0, e, 1.0)
        di = jnp.where((us != ds) & (e != 0), jnp.sign(ds - us) * stat, 0.0)
    else:
        raise ValueError(f"unknown test_type {test_type!r}")

    edge = (j < w) | (j > n - w - 1)
    return jnp.where(gap | edge | (j >= n), 0.0, di)


@functools.partial(jax.jit, static_argnames=("w", "test_type"))
def directionality_index(M: jnp.ndarray, gap: jnp.ndarray, n: jnp.ndarray,
                         w: int, test_type: str = "ttest") -> jnp.ndarray:
    up, down = _diag_bands(M, w)  # [w, N]
    return _di_from_bands(up, down, gap, n, test_type)


@functools.partial(jax.jit, static_argnames=("test_type",))
def directionality_index_band(up: jnp.ndarray, down: jnp.ndarray,
                              gap: jnp.ndarray, n: jnp.ndarray,
                              test_type: str = "ttest") -> jnp.ndarray:
    """DI from precomputed diagonal bands ``up``/``down`` [w, N] (the
    `_diag_bands` layout) — the dense matrix never materializes; at 40 kb
    the band is ~1% of it."""
    return _di_from_bands(up, down, gap, n, test_type)


@functools.partial(jax.jit, static_argnames=("local_bin",))
def tad_gap_mask_counts(nz_cnt: jnp.ndarray, n: jnp.ndarray,
                        local_bin: int) -> jnp.ndarray:
    """TAD gap rule from precomputed per-column nonzero counts over rows
    [i-local_bin, i+local_bin) — band analogue of ``tad_gap_mask``."""
    N = nz_cnt.shape[0]
    i = jnp.arange(N)
    t = 2 * local_bin * 0.8
    interior = (i >= local_bin) & (i <= n - 1 - local_bin)
    return jnp.where(interior, nz_cnt < t, True) | (i >= n)


@functools.partial(jax.jit, static_argnames=("local_bin",))
def tad_gap_mask(M: jnp.ndarray, n: jnp.ndarray, local_bin: int) -> jnp.ndarray:
    """TAD-calling gap rule (StructureFind.py:721-751): bin i is a gap when
    the nonzero count of column i over rows [i-local_bin, i+local_bin) is
    below 80% of the window, edges always gaps."""
    N = M.shape[0]
    nz = (M != 0).astype(jnp.float32)
    csum = jnp.cumsum(nz, axis=0)
    csum = jnp.concatenate([jnp.zeros((1, N), jnp.float32), csum], 0)
    i = jnp.arange(N)
    lo = jnp.clip(i - local_bin, 0, N)
    hi = jnp.clip(i + local_bin, 0, N)
    cnt = csum[hi, i] - csum[lo, i]
    t = 2 * local_bin * 0.8
    interior = (i >= local_bin) & (i <= n - 1 - local_bin)
    return jnp.where(interior, cnt < t, True) | (i >= n)
