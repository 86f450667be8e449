"""Isolate the hybrid-ICE per-iteration overhead: tile-only loop vs
scattered-only loop vs combined loop, all with arrays passed as jit args.

Writes to /tmp/probe_hybrid3.log.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("/tmp/probe_hybrid3.log", "a", buffering=1)
T0 = time.perf_counter()


def log(msg):
    LOG.write(f"[{time.perf_counter()-T0:8.1f}s] {msg}\n")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    log(f"devices {jax.devices()}")
    from hichap_master_tpu.ops.sparse import block_sym_matvec
    from hichap_master_tpu.ops.sparse_hybrid import _scattered_marginal

    rng = np.random.default_rng(0)
    N = 303_744
    K, T = 9_417, 128
    R = N // T
    tiles = jnp.asarray(rng.uniform(0, 3, (K, T, T)).astype(np.float32))
    rr = jnp.asarray(rng.integers(0, R, K).astype(np.int32))
    cc = jnp.asarray(
        np.maximum(np.asarray(rng.integers(0, R, K)),
                   rng.integers(0, R, K)).astype(np.int32))
    P = 25 * (1 << 20)
    cols = jnp.asarray(rng.integers(0, N, P).astype(np.int32))
    vals = jnp.asarray(rng.uniform(0, 3, P).astype(np.float32))
    bounds = jnp.asarray(np.linspace(0, P, N + 1).astype(np.int32))
    b0 = jnp.ones(N, jnp.float32)

    def loop20(marg_fn, *arrs):
        def body(state):
            it, b = state
            m = marg_fn(b, *arrs)
            m = jnp.where(m == 0, 1.0, m)
            return it + 1, b / jnp.sqrt(jnp.abs(m) + 1.0)
        return jax.lax.while_loop(lambda s: s[0] < 20, body,
                                  (jnp.zeros((), jnp.int32), b0))

    def tile_marg(b, t, r, c):
        return block_sym_matvec(t, r, c, b, R=R, T=T, reduce="onehot")

    def sc_marg(b, co, va, bo):
        return _scattered_marginal(co, va, bo, b)

    def run(tag, fn, *arrs):
        t = time.perf_counter()
        out = jax.jit(fn)(*arrs)
        jax.block_until_ready(out)
        log(f"{tag}: cold {time.perf_counter()-t:.2f}s")
        t = time.perf_counter()
        out = jax.jit(fn)(*arrs)
        jax.block_until_ready(out)
        log(f"{tag}: warm {time.perf_counter()-t:.2f}s")

    run("tile-only 20-iter loop",
        lambda t_, r_, c_: loop20(tile_marg, t_, r_, c_), tiles, rr, cc)
    run("scattered-only 20-iter loop",
        lambda co, va, bo: loop20(sc_marg, co, va, bo), cols, vals, bounds)
    run("combined 20-iter loop",
        lambda t_, r_, c_, co, va, bo: loop20(
            lambda b, *a: tile_marg(b, t_, r_, c_) + sc_marg(b, co, va, bo)),
        tiles, rr, cc, cols, vals, bounds)

    # single dispatches for reference
    run("tile matvec single", tile_marg, b0, tiles, rr, cc)
    run("scattered marginal single", sc_marg, b0, cols, vals, bounds)


if __name__ == "__main__":
    main()
