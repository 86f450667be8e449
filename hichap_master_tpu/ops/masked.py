"""Masked reductions for padded tensors.

Padded/batched chromosome tensors carry dead rows; every statistic the
reference computes on ragged per-chromosome arrays (percentiles, medians,
means) becomes a masked reduction here so the whole batch stays jittable
with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_percentile(values: jnp.ndarray, mask: jnp.ndarray, q: float) -> jnp.ndarray:
    """``np.percentile(values[mask], q)`` with linear interpolation.

    Returns 0 when the mask is empty.
    """
    big = jnp.where(mask, values, jnp.inf)
    srt = jnp.sort(big)
    cnt = jnp.sum(mask)
    pos = (cnt - 1).astype(values.dtype) * (q / 100.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, values.shape[0] - 1)
    hi = jnp.clip(jnp.ceil(pos).astype(jnp.int32), 0, values.shape[0] - 1)
    frac = pos - jnp.floor(pos)
    out = srt[lo] * (1 - frac) + srt[hi] * frac
    return jnp.where(cnt > 0, out, jnp.zeros((), values.dtype))


def masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return masked_percentile(values, mask, 50.0)


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    cnt = jnp.sum(mask)
    s = jnp.sum(jnp.where(mask, values, 0))
    return jnp.where(cnt > 0, s / cnt, jnp.zeros((), values.dtype))


def masked_var(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Population variance over masked entries (matches ``np.var``)."""
    mu = masked_mean(values, mask)
    return masked_mean((values - mu) ** 2, mask)


def masked_max(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(jnp.where(mask, values, -jnp.inf))


def masked_min(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.min(jnp.where(mask, values, jnp.inf))


def valid_row_mask(n: jnp.ndarray, size: int) -> jnp.ndarray:
    """Boolean ``[size]`` mask of rows < n."""
    return jnp.arange(size) < n
