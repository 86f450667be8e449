"""Time the raw pieces of the scattered marginal on TPU.

Writes to /tmp/probe_gather.log.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("/tmp/probe_gather.log", "a", buffering=1)
T0 = time.perf_counter()


def log(msg):
    LOG.write(f"[{time.perf_counter()-T0:8.1f}s] {msg}\n")


def timeit(tag, fn, *args, reps=5):
    t = time.perf_counter()
    out = fn(*args)
    np.asarray(out)[:2] if hasattr(out, "shape") else out
    import jax
    jax.block_until_ready(out)
    log(f"{tag}: compile+run {time.perf_counter()-t:.2f}s")
    t = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    log(f"{tag}: warm {(time.perf_counter()-t)/reps*1000:.1f}ms")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    log(f"devices {jax.devices()}")

    rng = np.random.default_rng(0)
    N = 303_744

    for logp in (23, 26):
        P = 1 << logp
        cols = jnp.asarray(rng.integers(0, N, P).astype(np.int32))
        vals = jnp.asarray(rng.uniform(0, 3, P).astype(np.float32))
        b = jnp.asarray(rng.uniform(0.5, 2, N).astype(np.float32))
        bounds = jnp.asarray(np.linspace(0, P, N + 1).astype(np.int32))

        g = jax.jit(lambda b, c: b[c])
        timeit(f"gather 2^{logp}", g, b, cols)

        gs = jax.jit(lambda b, c, v: (v * b[c]).reshape(-1, 128).sum(1))
        timeit(f"gather+mul+chunksum 2^{logp}", gs, b, cols, vals)

        # sorted-indices variant
        cs = jnp.asarray(np.sort(np.asarray(cols)))
        timeit(f"gather sorted 2^{logp}", g, b, cs)

        gi = jax.jit(lambda b, c: jnp.take(b, c, indices_are_sorted=True))
        timeit(f"take sorted-hint 2^{logp}", gi, b, cs)

        # row gather: [N+1, 128] rows from the chunked view
        blk = (vals).reshape(-1, 128)
        bidx = jnp.asarray(
            rng.integers(0, P // 128, N + 1).astype(np.int32))
        rg = jax.jit(lambda blk, i: blk[i])
        timeit(f"row-gather [N,128] 2^{logp}", rg, blk, bidx)

        from hichap_master_tpu.ops.sparse_hybrid import _scattered_marginal
        sm = jax.jit(_scattered_marginal)
        timeit(f"full scattered marginal 2^{logp}", sm, cols, vals, bounds, b)


if __name__ == "__main__":
    main()
