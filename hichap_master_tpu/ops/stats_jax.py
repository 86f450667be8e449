"""On-device λ-chunked Poisson + BH-FDR for the loop caller.

The reference runs this stage on the host, per λ-chunk
(HiCHap/StructureFind.py:1869-1902).  Here the whole stage — chunk
assignment against the 2^(k/3) edge grid, Poisson survival at the chunk's
upper edge via the regularized lower incomplete gamma, and per-chunk BH via
one lexsort + a segmented reverse running-min scan — is a single jitted XLA
program, so millions of candidate pixels never bounce through a Python
loop.  Semantics match ``ops.stats.poisson_bh_chunked`` (the float64 host
oracle); device math is float32, which can flip razor-edge q ≈ sig calls —
the host path remains the default on CPU backends and under
``HICHAP_HOST_STATS=1``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.special import gammainc

# 2^(127/3) ≈ 5.4e12 — far above any expected contact count, so a fixed
# edge grid keeps the jitted shapes static.
_MAXBIN = 128


def _edges() -> jnp.ndarray:
    return jnp.concatenate([
        jnp.zeros((1,), jnp.float32),
        jnp.exp2(jnp.arange(_MAXBIN, dtype=jnp.float32) / 3.0),
    ])


def _segmented_reverse_cummin(vals, segs):
    """Running min from the END of each equal-``segs`` run (arrays sorted
    by segment).  Associative segmented-min scan over the reversed array."""
    v = vals[::-1]
    s = segs[::-1]

    def combine(a, b):
        av, aseg = a
        bv, bseg = b
        return jnp.where(aseg == bseg, jnp.minimum(av, bv), bv), bseg

    out, _ = jax.lax.associative_scan(combine, (v, s))
    return out[::-1]


@functools.partial(jax.jit)
def poisson_bh_chunked_jax(o, e, valid):
    """pv, qv for every pixel; invalid/unchunked pixels get 1.0.

    o, e : float arrays (observed counts, expected λ)
    valid: bool mask of live pixels
    """
    o = o.astype(jnp.float32)
    e = e.astype(jnp.float32)
    edges = _edges()
    c = jnp.searchsorted(edges, e, side="right") - 1      # digitize - 1
    ok = valid & (c >= 0) & (c < _MAXBIN)
    ok &= e != edges[jnp.clip(c, 0, _MAXBIN)]             # open lower bound
    rv = edges[jnp.clip(c, 0, _MAXBIN - 1) + 1]
    pv = jnp.where(ok, gammainc(jnp.floor(o) + 1.0, rv), 1.0)

    # per-chunk BH: sort by (chunk, p) with dead pixels parked in seg -1
    seg = jnp.where(ok, c, -1)
    order = jnp.lexsort((pv, seg))
    ps = pv[order]
    ss = seg[order]
    live = ss >= 0
    # rank within segment and segment size
    idx = jnp.arange(ps.size)
    is_start = jnp.concatenate([jnp.ones((1,), bool), ss[1:] != ss[:-1]])
    start_idx = jnp.where(is_start, idx, 0)
    start = jax.lax.associative_scan(jnp.maximum, start_idx)
    rank = idx - start + 1
    seg_size = jnp.zeros(ps.size, jnp.int32).at[start].add(
        jnp.ones(ps.size, jnp.int32))[start]
    ranked = ps * seg_size.astype(ps.dtype) / rank.astype(ps.dtype)
    qs = jnp.clip(_segmented_reverse_cummin(ranked, ss), 0.0, 1.0)
    qs = jnp.where(live, qs, 1.0)
    qv = jnp.zeros_like(ps).at[order].set(qs)
    return pv, qv
