"""Fused HICCUPS escalation ladder as a Pallas TPU kernel.

The XLA map-space formulation (ops/loops_packed.escalation_packed_maps)
evaluates ~72 shifted-slice ops per ladder level over [E, Xp] maps — about
1,150 full-map traversals per chromosome, each an HBM round trip unless
XLA fuses it.  This kernel holds one x-tile (plus a one-tile halo) of the
three anti-diagonal prefix maps (raw / balanced / expected) in VMEM and
runs the ENTIRE ladder on it: HBM traffic drops to ~3 reads of each map
plus one write of the outputs.

The reference's global stopping rule (StructureFind.py:1777-1830: resolve
pixels with ≥16 lower-left reads per widening window; abandon once <10% of
remaining pixels resolve at a level) looks sequentially coupled across the
whole map, but the lower-left read count is MONOTONE in the window width
(sums of non-negative counts over nested regions), so each pixel has a
well-defined first-resolving level t(x).  The kernel emits t(x), the
donut/lower-left background values AT level t(x), and a per-tile histogram
of t; the 16-step stop-level scan then runs on the histogram alone, and
``resolved = t <= stop_level`` — semantics identical to the XLA map path
on resolved pixels (verified in tests/test_pallas_escalation.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.loops_packed import anti_diagonal_prefix

_UNRESOLVED = 127
_EXTRA_E = 48      # zero row margin: every row shift is wrap-free
_HALO_X = 128      # lane-aligned column halo from the neighbor tiles
_TILE_X = 256


def _roll1(a, sh, axis: int):
    """Circular shift with a static OR traced amount.

    Static path skips zero shifts (Mosaic lowers a roll into per-axis
    slices and a zero shift yields a zero-width vector type it rejects).
    Traced path uses ``pltpu.roll``'s dynamic rotate with the shift
    normalized to [0, size)."""
    size = a.shape[axis]
    if isinstance(sh, (int, np.integer)):
        sh = int(sh) % size
        if sh == 0:
            return a
        return pltpu.roll(a, shift=sh, axis=axis)
    return pltpu.roll(a, shift=jnp.mod(sh, size), axis=axis)


def _roll2(a, de, dx):
    """a[r, c] -> a[r + de, c + dx], wrap-free for the center region
    (margins/halos absorb the wrapped lanes)."""
    a = _roll1(a, -de, 0)
    return _roll1(a, -dx, 1)


def _rect(W, r0, r1, c0, c1):
    """Rectangle sum in the packed domain (ops/loops_packed.rect_map);
    bounds may be static ints or traced (the ladder level)."""
    return (_roll2(W, c1 - r0, r0) - _roll2(W, c1 - r1 - 1, r1 + 1)
            - _roll2(W, c0 - 1 - r0, r0) + _roll2(W, c0 - 1 - r1 - 1,
                                                  r1 + 1))


def _donut_var(W, w):
    """Level-dependent part of the donut background (w traced)."""
    return (_rect(W, -w, w, -w, w)
            - _rect(W, 0, 0, -w, w)
            - _rect(W, -w, w, 0, 0))


def _donut_const(W, pw: int):
    """Level-invariant part (subtracted): the pw peak exclusion."""
    return (_rect(W, -pw, pw, -pw, pw)
            - _rect(W, 0, 0, -pw, pw)
            - _rect(W, -pw, pw, 0, 0))


# full donut/lowerleft = var(w) - const(pw); the kernel body keeps the
# two parts separate so the pw-consts hoist out of the level loop


def _ladder_kernel(wr_l, wr_c, wr_r, wb_l, wb_c, wb_r, we_l, we_c, we_r,
                   mask_ref, t_ref, a0_ref, a1_ref, a2_ref, a3_ref,
                   hist_ref, *, ww: int, maxww: int, pw: int):
    def window(l, c, r):
        return jnp.concatenate(
            [l[:, -_HALO_X:], c[:], r[:, :_HALO_X]], axis=1)

    Wr = window(wr_l, wr_c, wr_r)
    Wb = window(wb_l, wb_c, wb_r)
    We = window(we_l, we_c, we_r)
    pix = mask_ref[:] > 0

    def center(m):
        return m[:, _HALO_X:_HALO_X + _TILE_X]

    # The ladder runs as a fori_loop with the window width TRACED: a
    # Python-unrolled loop makes every level's rolled maps loop-invariant
    # pure functions of W, the scheduler hoists them, and the live set
    # blows the 128 MB VMEM (observed 150 MB at chr1 scale).  With dynamic
    # pltpu.roll shifts only one level's temporaries are ever live.
    # Level-invariant pw-rects hoist once, outside the loop (static shifts).
    dconst_b = _donut_const(Wb, pw)
    dconst_e = _donut_const(We, pw)
    llconst_r = _rect(Wr, 1, pw, -pw, -1)
    llconst_b = _rect(Wb, 1, pw, -pw, -1)
    llconst_e = _rect(We, 1, pw, -pw, -1)

    # static one-hot target grid: Mosaic has no scatter-add lowering even
    # for a constant index, so the histogram updates via an iota mask
    hri = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    hci = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    shape = (wr_c.shape[0], _TILE_X)
    t0 = jnp.full(shape, _UNRESOLVED, jnp.int32)
    z = jnp.zeros(shape, jnp.float32)

    def body(li, carry):
        t, a0, a1, a2, a3, hist = carry
        w = ww + li
        reads = center(_rect(Wr, 1, w, -w, -1) - llconst_r)
        newly = pix & (t == _UNRESOLVED) & (reads >= 16.0)
        t = jnp.where(newly, li, t)
        v0 = _donut_var(Wb, w) - dconst_b
        v1 = _donut_var(We, w) - dconst_e
        v2 = _rect(Wb, 1, w, -w, -1) - llconst_b
        v3 = _rect(We, 1, w, -w, -1) - llconst_e
        a0 = a0 + jnp.where(newly, center(v0), 0.0)
        a1 = a1 + jnp.where(newly, center(v1), 0.0)
        a2 = a2 + jnp.where(newly, center(v2), 0.0)
        a3 = a3 + jnp.where(newly, center(v3), 0.0)
        hsel = (hri == li // 128) & (hci == li % 128)
        hist = hist + jnp.where(hsel,
                                jnp.sum(newly.astype(jnp.float32)), 0.0)
        return t, a0, a1, a2, a3, hist

    t, a0, a1, a2, a3, hist = jax.lax.fori_loop(
        0, maxww - ww + 1, body,
        (t0, z, z, z, z, jnp.zeros((8, 128), jnp.float32)))

    t_ref[:] = t
    a0_ref[:], a1_ref[:], a2_ref[:], a3_ref[:] = a0, a1, a2, a3
    hist_ref[:] = hist


def _pad_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit,
                   static_argnames=("ww", "maxww", "pw", "B", "e_lo",
                                    "x_pad", "interpret"))
def escalation_pallas(D_raw, D_bal, D_exp, e_pix, x_pix, valid,
                      ww: int, maxww: int, pw: int, B: int, e_lo: int,
                      x_pad: int, interpret: bool = False):
    """Drop-in for ops/loops_packed.escalation_packed_maps on TPU.

    Returns (resolved, bS_K, bE_K, bS_Y, bE_Y) per pixel; values at
    unresolved pixels are unspecified (downstream masks by ``resolved``,
    models/loops._pcaller_post).
    """
    E, Xp = D_raw.shape
    n_levels = maxww - ww + 1
    # strictly below the sentinel: a 128-level ladder's last index would
    # collide with _UNRESOLVED (127) and report final-level pixels
    # unresolved
    assert n_levels < 128

    W_raw = anti_diagonal_prefix(D_raw)
    W_bal = anti_diagonal_prefix(D_bal)
    W_exp = anti_diagonal_prefix(D_exp)

    er = jnp.where(valid, e_pix + e_lo, 0)
    xr = jnp.where(valid, x_pix + x_pad, 0)
    pixmask = jnp.zeros((E, Xp), jnp.float32).at[er, xr].max(
        valid.astype(jnp.float32))

    # rows: wrap-free margin; columns: one zero tile each side so every
    # tile has valid left/right neighbors
    E_tot = _pad_up(E + 2 * _EXTRA_E, 8)
    Xp_t = _pad_up(Xp, _TILE_X)
    ntiles = Xp_t // _TILE_X

    def _embed(W):
        out = jnp.zeros((E_tot, Xp_t + 2 * _TILE_X), jnp.float32)
        return jax.lax.dynamic_update_slice(out, W, (_EXTRA_E, _TILE_X))

    Wr3 = _embed(W_raw)
    Wb3 = _embed(W_bal)
    We3 = _embed(W_exp)
    maskp = jnp.zeros((E_tot, Xp_t), jnp.float32)
    maskp = jax.lax.dynamic_update_slice(maskp, pixmask, (_EXTRA_E, 0))

    def _wspec(off):
        return pl.BlockSpec((E_tot, _TILE_X), lambda i, off=off: (0, i + off),
                            memory_space=pltpu.VMEM)

    tile = pl.BlockSpec((E_tot, _TILE_X), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    kern = functools.partial(_ladder_kernel, ww=ww, maxww=maxww, pw=pw)
    t_m, a0, a1, a2, a3, hist = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=([_wspec(0), _wspec(1), _wspec(2)] * 3) + [tile],
        out_specs=(tile, tile, tile, tile, tile, hspec),
        out_shape=(
            jax.ShapeDtypeStruct((E_tot, Xp_t), jnp.int32),
            jax.ShapeDtypeStruct((E_tot, Xp_t), jnp.float32),
            jax.ShapeDtypeStruct((E_tot, Xp_t), jnp.float32),
            jax.ShapeDtypeStruct((E_tot, Xp_t), jnp.float32),
            jax.ShapeDtypeStruct((E_tot, Xp_t), jnp.float32),
            jax.ShapeDtypeStruct((8 * ntiles, 128), jnp.float32),
        ),
        # ~24 MB live at chr1 scale (windows + hoisted pw-rects + carried
        # accumulators + one level's roll temporaries) — above the 16 MB
        # default scoped-vmem stack limit, comfortably under the 128 MB
        # hardware VMEM with double-buffered blocks
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(Wr3, Wr3, Wr3, Wb3, Wb3, Wb3, We3, We3, We3, maskp)

    # stop-level scan on the level histogram (StructureFind.py:1802-1829)
    cnt = jnp.sum(hist.reshape(ntiles, 8, 128), axis=0).reshape(-1)[:n_levels]
    total = jnp.sum(pixmask > 0)
    resolved_before = jnp.concatenate(
        [jnp.zeros((1,)), jnp.cumsum(cnt)[:-1]])
    remaining = jnp.maximum(total - resolved_before, 1.0)
    ratio = cnt / remaining

    def scan_fn(stopped, r):
        counted = jnp.where(stopped, 0.0, 1.0)
        return stopped | (r < 0.1), counted

    _, live = jax.lax.scan(scan_fn, jnp.asarray(False), ratio)
    sw = jnp.sum(live) - 1  # last level whose newly still counted

    def _center(m):
        return jax.lax.dynamic_slice(m, (_EXTRA_E, 0), (E, Xp))

    tv = _center(t_m)[er, xr]
    resolved = valid & (tv != _UNRESOLVED) & (tv <= sw)
    outs = tuple(_center(a)[er, xr] for a in (a0, a1, a2, a3))
    return (resolved,) + outs
