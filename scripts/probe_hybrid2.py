"""Decompose the hybrid-ICE TPU compile stall: time each piece standalone.

Writes to /tmp/probe_hybrid2.log.  Pieces, each jitted fresh:
  A. scattered marginal alone at 2^20 / 2^23 / 2^26 pixels
  B. tile matvec alone (known-good shape from perf_sparse_gw)
  C. hybrid balance with scattered part truncated to 2^20
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("/tmp/probe_hybrid2.log", "a", buffering=1)
T0 = time.perf_counter()


def log(msg):
    LOG.write(f"[{time.perf_counter()-T0:8.1f}s] {msg}\n")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    from hichap_master_tpu.ops.sparse_hybrid import (_scattered_marginal,
                                                     hybrid_ice_balance)

    rng = np.random.default_rng(0)
    N = 303_744  # hg19 10 kb padded to 128

    for logp in (20, 23, 26):
        P = 1 << logp
        cols = jnp.asarray(rng.integers(0, N, P).astype(np.int32))
        vals = jnp.asarray(rng.uniform(0, 3, P).astype(np.float32))
        bounds = jnp.asarray(
            np.linspace(0, P, N + 1).astype(np.int32))
        b = jnp.ones(N, jnp.float32)
        fn = jax.jit(_scattered_marginal)
        t = time.perf_counter()
        out = fn(cols, vals, bounds, b)
        np.asarray(out[:2])
        log(f"A: scattered marginal 2^{logp}: compile+run "
            f"{time.perf_counter()-t:.1f}s")
        t = time.perf_counter()
        np.asarray(fn(cols, vals, bounds, b)[:2])
        log(f"A: scattered marginal 2^{logp}: warm "
            f"{time.perf_counter()-t:.2f}s")

    # C: full hybrid with tiny scattered part, real tile count
    K, T = 9_417, 128
    R = N // T
    tiles = jnp.asarray(rng.uniform(0, 3, (K, T, T)).astype(np.float32))
    rr = rng.integers(0, R, K).astype(np.int32)
    cc_ = np.maximum(rr, rng.integers(0, R, K)).astype(np.int32)
    for logp in (23, 26):
        P = 1 << logp
        cols = jnp.asarray(rng.integers(0, N, P).astype(np.int32))
        vals = jnp.asarray(rng.uniform(0, 3, P).astype(np.float32))
        bounds = jnp.asarray(np.linspace(0, P, N + 1).astype(np.int32))
        sc_nnz = jnp.asarray(np.diff(np.linspace(0, P, N + 1)).astype(np.float32))
        t = time.perf_counter()
        w, st = hybrid_ice_balance(
            tiles, jnp.asarray(rr), jnp.asarray(cc_), cols, vals, bounds,
            sc_nnz, jnp.asarray(N), R=R, T=T, max_iters=1, tol=0.0)
        np.asarray(w[:2])
        log(f"C: hybrid balance (sc=2^{logp}, K={K}): compile+run "
            f"{time.perf_counter()-t:.1f}s")
        t = time.perf_counter()
        w, st = hybrid_ice_balance(
            tiles, jnp.asarray(rr), jnp.asarray(cc_), cols, vals, bounds,
            sc_nnz, jnp.asarray(N), R=R, T=T, max_iters=20, tol=0.0)
        np.asarray(w[:2])
        log(f"C: hybrid balance (sc=2^{logp}) 20 iters: "
            f"{time.perf_counter()-t:.1f}s")


if __name__ == "__main__":
    main()
