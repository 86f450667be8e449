"""A/B: the pass-3 disk-vote search kernels at production scale.

lex  — ``sparse_impute_vote``: lexicographic binary search over the full
       (row, col) pixel list; log2(nnz) steps x 2 gathers each.
rowptr — ``sparse_impute_vote_rowptr`` (round 5): row-pointer-bounded
       search; log2(max row nnz) steps x 1 gather each.

Builds a SparseU at the diploid 10 kb genome-wide scale (hg19 haplotype
~607k bins; nnz set to the e2e's un-imputed pixel count) and times both
kernels over identical VOTE_CHUNK query batches.

    python scripts/probe_vote_ab.py                 # chip
    JAX_PLATFORMS=cpu python scripts/probe_vote_ab.py   # host control

Writes .probe_vote_ab.json.
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

S = int(os.environ.get("VOTE_S", "607282"))        # hap bins at 10 kb
NNZ = int(float(os.environ.get("VOTE_NNZ", "12e6")))  # upper-tri pixels
L = int(os.environ.get("VOTE_L", "1000"))          # 10 Mb / 10 kb
Q = 1 << 17                                        # VOTE_CHUNK
CHUNKS = int(os.environ.get("VOTE_CHUNKS", "8"))
SAMPLES = int(os.environ.get("VOTE_SAMPLES", "3"))


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(_REPO, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    from hichap_master_tpu.ops.sparse_impute import (SparseU,
                                                     disk_row_intervals,
                                                     sparse_impute_vote,
                                                     sparse_impute_vote_rowptr)

    rng = np.random.default_rng(7)
    t0 = time.perf_counter()
    # banded intra + scattered inter mass, like the un-imputed hap matrix
    n_band = int(NNZ * 0.8)
    r1 = rng.integers(0, S, n_band)
    c1 = np.minimum(r1 + rng.integers(0, 200, n_band), S - 1)
    r2 = rng.integers(0, S, NNZ - n_band)
    c2 = rng.integers(0, S, NNZ - n_band)
    rows = np.concatenate([r1, np.minimum(r2, c2)])
    cols = np.concatenate([c1, np.maximum(r2, c2)])
    keys = np.unique(rows.astype(np.int64) * S + cols)
    rows, cols = keys // S, keys % S
    vals = rng.integers(1, 6, rows.size)
    su = SparseU(rows, cols, vals, S)
    ri, lo, hi = disk_row_intervals(L)
    print(f"SparseU: S={S} nnz={su.nnz/1e6:.1f}M iters={su.iters} "
          f"row_iters={su.row_iters} disk_rows={ri.size} "
          f"(built {time.perf_counter() - t0:.1f} s) "
          f"backend={jax.default_backend()}", flush=True)

    rk = rng.integers(L, S - L - 1, (CHUNKS, Q)).astype(np.int64)
    cs = rng.integers(L, S - L - 1, (CHUNKS, Q)).astype(np.int64)
    cc = rng.integers(L, S - L - 1, (CHUNKS, Q)).astype(np.int64)
    valid = np.ones(Q, bool)
    args_common = (jnp.asarray(ri), jnp.asarray(lo), jnp.asarray(hi),
                   jnp.int32(S), L, 2.0, 0.9)

    def run_lex(i):
        return sparse_impute_vote(
            su.srows, su.scols, su.cum32, jnp.asarray(rk[i]),
            jnp.asarray(cs[i]), jnp.asarray(cc[i]), jnp.asarray(valid),
            *args_common, su.iters)

    def run_rowptr(i):
        return sparse_impute_vote_rowptr(
            su.scols, su.cum32, su.row_ptr, jnp.asarray(rk[i]),
            jnp.asarray(cs[i]), jnp.asarray(cc[i]), jnp.asarray(valid),
            *args_common, su.row_iters)

    out = {"S": S, "nnz": int(su.nnz), "L": L, "chunks": CHUNKS, "q": Q,
           "lex_iters": su.iters, "rowptr_iters": su.row_iters,
           "backend": jax.default_backend()}
    results = {}
    for name, fn in (("lex", run_lex), ("rowptr", run_rowptr)):
        h, t = fn(0)
        h = np.asarray(h)
        results[name] = (h.copy(), np.asarray(t).copy())
        rates = []
        for _ in range(SAMPLES):
            t0 = time.perf_counter()
            for i in range(CHUNKS):
                h, t = fn(i)
                np.asarray(h[:1])
            dt = time.perf_counter() - t0
            rates.append(CHUNKS * Q / dt)
        rates.sort()
        med = rates[len(rates) // 2]
        out[f"{name}_pairs_per_s"] = round(med)
        out[f"{name}_samples"] = [round(r) for r in rates]
        print(f"{name}: {med/1e3:.1f}k pairs/s (samples "
              f"{[round(r/1e3, 1) for r in rates]}k)", flush=True)

    h_l, t_l = results["lex"]
    h_r, t_r = results["rowptr"]
    assert (h_l == h_r).all() and (t_l[h_l] == t_r[h_r]).all(), "PARITY FAIL"
    out["speedup"] = round(out["rowptr_pairs_per_s"]
                           / out["lex_pairs_per_s"], 2)
    out["parity"] = "exact"
    print(f"rowptr/lex speedup: {out['speedup']}x (exact parity)",
          flush=True)
    with open(os.path.join(_REPO, ".probe_vote_ab.json"), "w") as f:
        json.dump(out, f)
    print("written to .probe_vote_ab.json", flush=True)


if __name__ == "__main__":
    main()
