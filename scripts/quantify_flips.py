"""Quantify float32 device-stats decision flips at production scale.

VERDICT r3 weak #8: DIVERGENCES.md documents that the on-device f32 stats
can flip razor-edge decisions vs the reference's float64 host math, with an
escape hatch (HICHAP_HOST_STATS=1) — but called the rate "rare" without a
number.  This script measures it, three ways:

  A. λ-chunk Poisson + BH q-values (ops/stats_jax.poisson_bh_chunked_jax,
     f32) vs the float64 host path (ops/stats.poisson_bh_chunked) on 10M
     pixels at production-like coverage: significance flips at sig=0.05.
     Spec: HiCHap/StructureFind.py:1869-1902.
  B. The >=16-read escalation ladder (ops/loops_packed.
     escalation_packed_maps) run in f32 (production) vs the same program
     compiled in f64 (x64 oracle) on chr1-scale band pixels at dense
     coverage: resolved-flag flips + donut-E relative error.
  C. End-to-end pcaller_multi on a chr1-scale chromosome: the device
     (f32) post path vs HICHAP_HOST_STATS=1 (f64): final loop-call set
     difference — the user-visible flip rate.

Runs on the CPU backend (f64 is unavailable on TPU, and CPU f32 executes
the same IEEE single-precision arithmetic the TPU does modulo reduction
order — stated in the output).  Writes .flips.json and prints a table to
paste into DIVERGENCES.md.

Usage: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/quantify_flips.py
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "scripts"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_enable_x64", True)  # f64 oracle programs

import jax.numpy as jnp
import numpy as np

OUT = {}


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def stage_a_bh(pixels=10_000_000, sig=0.05, seed=0):
    """BH q-value significance flips, f32 device program vs f64 host."""
    from hichap_master_tpu.ops.stats import poisson_bh_chunked
    from hichap_master_tpu.ops.stats_jax import poisson_bh_chunked_jax

    rng = np.random.default_rng(seed)
    # production-like expected counts: lognormal body (decay-normalized
    # donut expectations cluster around a few reads) + a heavy tail
    e = np.exp(rng.normal(np.log(3.0), 1.1, pixels))
    e = np.clip(e, 0.05, 500.0)
    # 2% truly enriched pixels (the loop population BH must separate)
    enr = rng.random(pixels) < 0.02
    o = rng.poisson(e * np.where(enr, 2.5, 1.0)).astype(np.float64)
    t0 = time.perf_counter()
    pv_h, qv_h = poisson_bh_chunked(o, e)
    th = time.perf_counter() - t0
    op = o.astype(np.float32)
    ep = e.astype(np.float32)
    vp = np.ones(pixels, bool)
    t0 = time.perf_counter()
    pv_d, qv_d = poisson_bh_chunked_jax(jnp.asarray(op), jnp.asarray(ep),
                                        jnp.asarray(vp))
    qv_d = np.asarray(qv_d, np.float64)
    td = time.perf_counter() - t0
    sig_h = qv_h <= sig
    sig_d = qv_d <= sig
    flips = int((sig_h != sig_d).sum())
    margins = np.abs(qv_h[sig_h != sig_d] - sig)
    OUT["bh_pixels"] = pixels
    OUT["bh_significant_f64"] = int(sig_h.sum())
    OUT["bh_flips"] = flips
    OUT["bh_flips_per_10M"] = round(flips * 1e7 / pixels, 2)
    OUT["bh_flip_max_q_margin"] = float(margins.max()) if flips else 0.0
    log(f"A: BH flips {flips}/{pixels} ({OUT['bh_flips_per_10M']}/10M), "
        f"significant(f64)={int(sig_h.sum())}, "
        f"max |q-sig| among flips = {OUT['bh_flip_max_q_margin']:.2e} "
        f"(host {th:.0f}s, device-path {td:.0f}s)")


def stage_b_ladder(n=24_896, B=220, npix=1_500_000, seed=1):
    """Escalation-ladder resolved-flag flips, f32 vs a true f64 oracle.

    ``pack_coo`` hard-casts to f32 (the packed band IS f32 by design), so
    the oracle packs the same layout in NumPy float64 and runs the same
    map-space core — under x64, every prefix/rectangle/threshold op then
    executes in double precision.  Raw counts are integers, so the >=16
    threshold is EXACT in f32 while the anti-diagonal prefixes stay below
    2^24; the interesting numbers are (a) the prefix headroom at
    production coverage and (b) the measured flip rate once coverage
    pushes prefixes past 2^24 (the DIVERGENCES.md risk regime)."""
    from hichap_master_tpu.ops.loops_packed import (_escalation_maps_core,
                                                    anti_diagonal_prefix,
                                                    pack_margins)

    ww, maxww, pw = 3, 20, 1
    rng = np.random.default_rng(seed)
    e_lo, _e_hi, x_pad = pack_margins(maxww)
    Xp = n + 2 * x_pad
    nnz = 12 * n
    rows = rng.integers(0, n, nnz)
    offs = rng.integers(0, B, nnz)
    cols = np.minimum(rows + offs, n - 1)
    e_pix = rng.integers(ww, B - 1, npix).astype(np.int32)
    x_pix = rng.integers(0, n - B, npix).astype(np.int32)
    valid = jnp.asarray(np.ones(npix, bool))

    def pack64(v):
        M = np.zeros((B + 2 * e_lo, Xp))
        np.add.at(M, (cols - rows + e_lo, rows + x_pad), v)
        return M

    for cov, mean in (("realistic", 80.0), ("extreme", 20_000.0)):
        # distance-decay Poisson band at chr1 scale (perf_hg19's shape);
        # "extreme" is the documented ~10^4-reads-per-bin regime
        vals = rng.poisson(mean / (1.0 + offs / 30.0), nnz).astype(
            np.float64)
        Draw = pack64(vals)
        Dbal = pack64(vals * 0.37)
        Dexp = pack64(vals * 0.11 + 0.2)
        pref_max = float(np.asarray(
            anti_diagonal_prefix(jnp.asarray(Draw))).max())
        outs = {}
        for tag, dt in (("f32", np.float32), ("f64", np.float64)):
            args = tuple(jnp.asarray(d.astype(dt))
                         for d in (Draw, Dbal, Dexp))
            t0 = time.perf_counter()
            res, *maps = _escalation_maps_core(
                *args, jnp.asarray(e_pix), jnp.asarray(x_pix), valid,
                ww, maxww, pw, e_lo, x_pad)
            outs[tag] = (np.asarray(res), [np.asarray(m) for m in maps])
            log(f"B[{cov}]: ladder {tag} ran in "
                f"{time.perf_counter()-t0:.0f}s, "
                f"resolved={int(np.asarray(res).sum())}")
        res32, maps32 = outs["f32"]
        res64, maps64 = outs["f64"]
        flips = int((res32 != res64).sum())
        both = res32 & res64
        rel = max(float(np.max(np.abs(m32[both] - m64[both])
                               / np.maximum(np.abs(m64[both]), 1e-12)))
                  for m32, m64 in zip(maps32, maps64)) if both.any() else 0.0
        OUT[f"ladder_{cov}"] = {
            "pixels": npix,
            "mean_reads_per_bin": mean,
            "prefix_max": pref_max,
            "prefix_headroom_vs_2^24": round(2**24 / max(pref_max, 1), 2),
            "resolved_f64": int(res64.sum()),
            "flips": flips,
            "flips_per_10M": round(flips * 1e7 / npix, 2),
            "max_rel_map_err": rel,
        }
        log(f"B[{cov}]: prefix max {pref_max:.3g} "
            f"(2^24 headroom {2**24 / max(pref_max, 1):.2f}x), "
            f"flips {flips}/{npix} "
            f"({flips * 1e7 / npix:.2f}/10M), max rel map err {rel:.2e}")


def stage_c_endtoend(seed=2):
    """Final loop-call set: device f32 post vs HICHAP_HOST_STATS=1 f64."""
    from perf_hg19 import band_coo

    from hichap_master_tpu.models.loops import pcaller_multi, peaks_parameters

    res = 10_000
    params = peaks_parameters(res)
    band = params["maxapart"] // res + params["maxww"] + 1
    n = 24_896  # chr1 at 10 kb
    rng = np.random.default_rng(seed)
    rows, cols, vals = band_coo(rng, n, band, loops=60)
    inputs = {"1": (rows, cols, vals, np.ones(n), n)}

    def run(env):
        saved = {k: os.environ.get(k) for k in
                 ("HICHAP_HOST_STATS", "HICHAP_FORCE_DEVICE_POST")}
        os.environ.update(env)
        try:
            out = pcaller_multi(inputs, res, params)
        finally:
            for k, v in saved.items():
                os.environ.pop(k, None)
                if v is not None:
                    os.environ[k] = v
        d, _ = out["1"]  # donuts dict keyed by (x_bp, y_bp)
        return set(d.keys())

    t0 = time.perf_counter()
    host = run({"HICHAP_HOST_STATS": "1"})
    log(f"C: host-f64 pcaller: {len(host)} loops "
        f"({time.perf_counter()-t0:.0f}s)")
    t0 = time.perf_counter()
    dev = run({"HICHAP_FORCE_DEVICE_POST": "1"})
    log(f"C: device-f32 pcaller: {len(dev)} loops "
        f"({time.perf_counter()-t0:.0f}s)")
    OUT["e2e_loops_f64"] = len(host)
    OUT["e2e_loops_f32"] = len(dev)
    OUT["e2e_only_f64"] = len(host - dev)
    OUT["e2e_only_f32"] = len(dev - host)
    log(f"C: set diff — only-f64 {len(host - dev)}, "
        f"only-f32 {len(dev - host)}, shared {len(host & dev)}")


def main():
    OUT["backend"] = jax.default_backend()
    OUT["note"] = ("CPU f32 executes the same IEEE single-precision ops "
                   "as TPU f32 modulo reduction order; f64 oracles are "
                   "CPU-only")
    stage_a_bh()
    stage_b_ladder()
    stage_c_endtoend()
    with open(os.path.join(_REPO, ".flips.json"), "w") as f:
        json.dump(OUT, f, indent=1)
    log(f"written to .flips.json: {json.dumps(OUT)}")


if __name__ == "__main__":
    main()
