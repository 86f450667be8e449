"""Step-timed probe of hybrid ICE at real 10 kb scale on the chip.

Writes timestamped progress to /tmp/probe_hybrid.log (unbuffered) so a
timeout still leaves the last completed step visible.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("/tmp/probe_hybrid.log", "a", buffering=1)
T0 = time.perf_counter()


def log(msg):
    LOG.write(f"[{time.perf_counter()-T0:8.1f}s] {msg}\n")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    log(f"devices {jax.devices()}")

    from hichap_master_tpu.io import CoolerReader
    from hichap_master_tpu.ops.sparse_hybrid import (hybrid_from_coo,
                                                     ice_balance_hybrid)

    r = CoolerReader("/tmp/perf_e2e_oruh8apx/Matrix/Cooler/Merged_Multi.cool",
                     10_000)
    b1, b2, v = r.pixels_coo()
    log(f"pixels read: {len(v)/1e6:.1f}M")
    h = hybrid_from_coo(b1, b2, v, r.nbins)
    log(f"hybrid built: tiles={h.bm.K} dtype={h.bm.tiles.dtype} "
        f"({h.bm.tiles.nbytes/2**20:.0f} MB) scattered={h.P/1e6:.1f}M")
    n_sub = int(os.environ.get("PROBE_SUB", "0"))
    if n_sub:
        # shrink the scattered part to probe scaling
        import dataclasses
        h = dataclasses.replace(
            h, sc_cols=h.sc_cols[:n_sub], sc_vals=h.sc_vals[:n_sub],
            bounds=np.minimum(h.bounds, n_sub),
            sc_nnz=h.sc_nnz)  # nnz no longer exact; fine for a timing probe
        log(f"truncated scattered to {n_sub/1e6:.1f}M")
    for run in ("cold", "warm"):
        t = time.perf_counter()
        w, st = ice_balance_hybrid(h, max_iters=200, tol=1e-5)
        np.asarray(w[:2])
        log(f"production balance {run}: {time.perf_counter()-t:.1f}s "
            f"iters={int(st['iters'])} converged={bool(st['converged'])} "
            f"finite={int(np.isfinite(np.asarray(w)).sum())}")


if __name__ == "__main__":
    main()
