"""A/B: reduce="scan" vs reduce="onehot" on the SHARDED hybrid-ICE path
(8-device mesh), the one configuration where scan was hypothesized to win.

VERDICT r4 item 7: on a single chip the compensated-scan block-row
reduction LOSES to the one-hot matmul (469.8 vs 684.6 iters/s, BENCH_r04),
and its docstring rationale for existing — "inside shard_map each strategy
is a pure per-device computation, so scan shards as cleanly as onehot
while avoiding the [R, K_local] one-hot operand's memory traffic" — had
never been measured.  This script measures it: the production hybrid
genome-wide layout (dense band tiles + scattered row-sorted COO,
ops/sparse_hybrid.py), sharded over an 8-device mesh via
``shard_hybrid_layout`` + ``sharded_hybrid_ice``, balanced with both
reductions at a fixed iteration count.

Run on the 8-virtual-device CPU mesh (multi-chip TPU hardware is not
available in this environment; the relative comparison under the REAL
sharded program is the decision evidence):

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/ab_scan_sharded.py

Writes .perf_scan_ab.json (surfaced by bench.py as extras.sharded_scan_ab).
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

N_BINS = int(os.environ.get("AB_BINS", "32768"))
BAND = int(os.environ.get("AB_BAND", "192"))       # intra band in bins
TRANS = int(os.environ.get("AB_TRANS", "2000000"))  # scattered trans pixels
ITERS = int(os.environ.get("AB_ITERS", "40"))
SAMPLES = int(os.environ.get("AB_SAMPLES", "3"))


def gen_coo(rng):
    """Banded intra mass + scattered trans pixels, upper triangle."""
    rows_l, cols_l, vals_l = [], [], []
    # band: for each row, ~BAND/3 random columns within the band
    per_row = max(BAND // 3, 8)
    r = np.repeat(np.arange(N_BINS, dtype=np.int64), per_row)
    off = rng.integers(0, BAND, r.size)
    c = r + off
    keep = c < N_BINS
    rows_l.append(r[keep])
    cols_l.append(c[keep])
    d = off[keep] + 1.0
    vals_l.append(rng.poisson(80.0 / d**0.9) + 1.0)
    # trans: uniform scatter
    tr = rng.integers(0, N_BINS, TRANS)
    tc = rng.integers(0, N_BINS, TRANS)
    rows_l.append(np.minimum(tr, tc))
    cols_l.append(np.maximum(tr, tc))
    vals_l.append(rng.poisson(1.5, TRANS) + 1.0)
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    vals = np.concatenate(vals_l).astype(np.float64)
    # dedupe (hybrid_from_coo expects unique upper-tri keys)
    key = rows * N_BINS + cols
    order = np.argsort(key, kind="stable")
    key, rows, cols, vals = key[order], rows[order], cols[order], vals[order]
    uniq, first = np.unique(key, return_index=True)
    agg = np.add.reduceat(vals, first)
    return rows[first], cols[first], agg.astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    assert len(jax.devices()) >= 8, (
        f"need an 8-device mesh, got {len(jax.devices())} "
        "(set XLA_FLAGS=--xla_force_host_platform_device_count=8)")

    from hichap_master_tpu.ops.sparse_hybrid import hybrid_from_coo
    from hichap_master_tpu.parallel import make_mesh
    from hichap_master_tpu.parallel.sharding import (shard_hybrid_layout,
                                                     sharded_hybrid_ice)

    rng = np.random.default_rng(3)
    t0 = time.perf_counter()
    rows, cols, vals = gen_coo(rng)
    hyb = hybrid_from_coo(rows, cols, vals, N_BINS, T=128)
    print(f"hybrid layout: n={N_BINS} nnz={rows.size/1e6:.1f}M "
          f"tiles={hyb.bm.K} scattered={hyb.P/1e6:.2f}M px "
          f"(built in {time.perf_counter() - t0:.1f} s)", flush=True)

    mesh = make_mesh(8)
    bm, scc, scv, lb, snz = shard_hybrid_layout(hyb, 8)
    args = (jnp.asarray(bm.tiles), jnp.asarray(bm.brow),
            jnp.asarray(bm.bcol), jnp.asarray(scc), jnp.asarray(scv),
            jnp.asarray(lb), jnp.asarray(snz), jnp.asarray(N_BINS))

    out = {"n_bins": N_BINS, "tiles": int(hyb.bm.K),
           "scattered_px": int(hyb.P), "iters_per_sample": ITERS,
           "mesh_devices": 8, "backend": jax.default_backend()}
    weights = {}
    for red in ("onehot", "scan"):
        fn = sharded_hybrid_ice(mesh, bm.R, bm.T, max_iters=ITERS, tol=0.0,
                                reduce=red)
        t0 = time.perf_counter()
        w, st = fn(*args)
        w = np.asarray(w)
        print(f"{red}: compile+first run {time.perf_counter() - t0:.1f} s",
              flush=True)
        rates = []
        for _ in range(SAMPLES):
            t0 = time.perf_counter()
            w, st = fn(*args)
            it = int(np.asarray(st["iters"]))
            np.asarray(w[:2])
            rates.append(it / (time.perf_counter() - t0))
        rates.sort()
        med = rates[len(rates) // 2]
        out[f"{red}_iters_per_s"] = round(med, 2)
        out[f"{red}_samples"] = [round(r, 2) for r in rates]
        weights[red] = np.asarray(w)
        print(f"{red}: {med:.2f} iters/s (samples {rates})", flush=True)

    # numerical parity between the two strategies on the sharded path
    a, b = weights["onehot"], weights["scan"]
    mask = ~np.isnan(a)
    assert (mask == ~np.isnan(b)).all()
    md = float(np.max(np.abs(a[mask] - b[mask]) / np.abs(a[mask])))
    out["max_rel_weight_diff"] = md
    out["scan_vs_onehot"] = round(out["scan_iters_per_s"]
                                  / out["onehot_iters_per_s"], 3)
    print(f"scan/onehot = {out['scan_vs_onehot']} "
          f"(max rel weight diff {md:.2e})", flush=True)
    with open(os.path.join(_REPO, ".perf_scan_ab.json"), "w") as f:
        json.dump(out, f)
    print("written to .perf_scan_ab.json", flush=True)


if __name__ == "__main__":
    main()
