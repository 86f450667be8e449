"""Escalation-ladder micro-bench: XLA map-space vs fused Pallas kernel.

Runs both at full human chr1 scale (24,926 bins at 10 kb) with on-host
band generation.  Usage (real TPU):
    python scripts/perf_loops_pallas.py
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np


def main():
    import jax

    cache = os.path.join(_REPO, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    import jax.numpy as jnp
    from hichap_master_tpu.kernels.pallas_escalation import escalation_pallas
    from hichap_master_tpu.models.loops import peaks_parameters
    from hichap_master_tpu.ops.loops_packed import (escalation_packed_maps,
                                                    pack_coo, pack_margins)

    rng = np.random.default_rng(0)
    res = 10_000
    n = int(os.environ.get("PERF_N", str(249_250_621 // res + 1)))
    params = peaks_parameters(res)
    ww, maxww, pw = params["ww"], params["maxww"], params["pw"]
    B = params["maxapart"] // res + maxww + 1
    e_lo, _e_hi, x_pad = pack_margins(maxww)
    Xp = ((n + 2 * x_pad + 511) // 512) * 512

    d = np.arange(B)
    lam = 80.0 / (d + 1.0) ** 0.9
    counts = rng.poisson(np.broadcast_to(lam, (n, B))).astype(np.float32)
    rows, es = np.nonzero(counts)
    cols = rows + es
    keep = cols < n
    rows, cols = rows[keep], cols[keep]
    vals = counts[rows, cols - rows]
    print(f"n={n} band nnz={rows.size/1e6:.1f}M Xp={Xp}", flush=True)

    rj = jnp.asarray(rows.astype(np.int32))
    cj = jnp.asarray(cols.astype(np.int32))
    D_raw = pack_coo(rj, cj, jnp.asarray(vals), B, Xp, e_lo, x_pad)
    D_bal = pack_coo(rj, cj, jnp.asarray(vals * 0.4), B, Xp, e_lo, x_pad)
    D_exp = pack_coo(rj, cj, jnp.asarray(vals * 0.1 + 0.3), B, Xp, e_lo,
                     x_pad)
    sel = (cols - rows) >= ww
    e_pix = (cols - rows)[sel].astype(np.int32)
    x_pix = rows[sel].astype(np.int32)
    P2 = 1 << int(max(e_pix.size - 1, 1)).bit_length()
    ep = np.zeros(P2, np.int32)
    xp_ = np.zeros(P2, np.int32)
    vd = np.zeros(P2, bool)
    ep[: e_pix.size] = e_pix
    xp_[: e_pix.size] = x_pix
    vd[: e_pix.size] = True
    pix = (jnp.asarray(ep), jnp.asarray(xp_), jnp.asarray(vd))
    jax.block_until_ready((D_raw, D_bal, D_exp))
    print(f"pixels={e_pix.size/1e6:.2f}M (pad {P2})", flush=True)

    def run_xla():
        out = escalation_packed_maps(D_raw, D_bal, D_exp, *pix,
                                     ww, maxww, pw, B, e_lo, x_pad)
        return np.asarray(out[0]), np.asarray(out[1])

    def run_pallas():
        out = escalation_pallas(D_raw, D_bal, D_exp, *pix,
                                ww, maxww, pw, B, e_lo, x_pad)
        return np.asarray(out[0]), np.asarray(out[1])

    for name, fn in (("xla-maps", run_xla), ("pallas", run_pallas)):
        t0 = time.perf_counter()
        r, v = fn()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        r, v = fn()
        warm = time.perf_counter() - t0
        print(f"{name:10s} cold {cold:7.2f} s  warm {warm:7.3f} s  "
              f"resolved={int(r.sum())}", flush=True)

    rx, vx = run_xla()
    rp, vp = run_pallas()
    same = (rx == rp).all()
    close = np.allclose(vx[rx], vp[rx], rtol=1e-4, atol=1e-3)
    print(f"parity: resolved_equal={same} values_close={close}", flush=True)


if __name__ == "__main__":
    main()
