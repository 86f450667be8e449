"""Probe: where do the ~140 s of matrix.ice.500000.gw go on the chip?

The round-4 e2e campaign measured the 500 kb genome-wide ICE stage at
140-163 s WARM on the tunneled v5e, vs 2.3-4.6 s on the CPU backend —
while the balancing program itself is a single jitted while_loop whose
device time should be tens of milliseconds.  This probe rebuilds the
stage's exact inputs at e2e scale (hg19 chroms at 500 kb, ~12M unique
pixels with the e2e's 75/25 intra/inter mix) and times each phase
separately:

    read      h5py pixel-table read
    densify   host COO -> dense upper square
    upload    H2D of the dense square (+ device cast/symmetrize)
    compile   first ice_balance dispatch (persistent-cache hit or miss)
    balance   warm ice_balance dispatch + weight download
    iters     converged iteration count

Run on the chip:   python scripts/probe_ice500.py
CPU control:       JAX_PLATFORMS=cpu python scripts/probe_ice500.py
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

from perf_sparse_gw import HG19

RES = 500_000


def _cache():
    import jax

    cache = os.path.join(_REPO, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label:28s} {time.perf_counter() - t0:8.2f} s", flush=True)
    return out


def main():
    _cache()
    import jax
    import jax.numpy as jnp

    from hichap_master_tpu.core import Genome
    from hichap_master_tpu.io.cooler import CoolerReader, write_cooler

    chroms = {**{str(i + 1): l for i, l in enumerate(HG19[:22])},
              "X": HG19[22]}
    g = Genome(chroms, chroms=tuple(chroms))
    S = g.total_bins(RES)
    print(f"backend={jax.default_backend()}  bins={S}")

    rng = np.random.default_rng(0)
    path = "/tmp/probe_ice500.cool"

    def build():
        if os.path.exists(path):
            os.remove(path)
        # e2e-shaped pixels: banded intra + uniform inter, ~12M unique
        n_int = 6_000_000
        i1 = rng.integers(0, S, n_int)
        d = np.minimum(rng.geometric(0.25, n_int), 40)
        i2 = np.minimum(i1 + d, S - 1)
        n_tr = 8_000_000
        a = rng.integers(0, S, n_tr)
        b = rng.integers(0, S, n_tr)
        b1 = np.concatenate([np.minimum(i1, i2), np.minimum(a, b)])
        b2 = np.concatenate([np.maximum(i1, i2), np.maximum(a, b)])
        key = b1.astype(np.int64) * S + b2
        key = np.unique(key)
        b1u = (key // S).astype(np.int64)
        b2u = (key % S).astype(np.int64)
        v = rng.integers(1, 50, len(key)).astype(np.int64)
        write_cooler(path, g, RES, {}, genomewide_coo=(b1u, b2u, v),
                     dtype="int")
        return len(key)

    nnz = t("build synthetic cooler", build)
    print(f"nnz={nnz}")

    r = CoolerReader(path, RES)
    import h5py

    def read():
        with h5py.File(r.path, "rd" if False else "r") as f:
            grp = f[r.grp]
            return (grp["pixels/bin1_id"][:], grp["pixels/bin2_id"][:],
                    grp["pixels/count"][:])

    b1, b2, v = t("read pixel table", read)

    from hichap_master_tpu.core.contacts import pad_to_bucket
    P = pad_to_bucket(S)

    def densify():
        import hichap_master_tpu.io.cooler as cool
        return cool._dense_device_sym(b1, b2, v, P)

    Mj = t("densify+upload+sym (new path)", densify)
    t("sync", lambda: np.asarray(Mj[0, :8]))

    from hichap_master_tpu.ops.balance import ice_balance

    def cold():
        w, st = ice_balance(Mj, jnp.asarray(S))
        return np.asarray(w), {k: np.asarray(s) for k, s in st.items()}

    w, st = t("ice_balance first dispatch", cold)
    print(f"  iters={int(st['iters'])} converged={bool(st['converged'])}")
    w, st = t("ice_balance warm", cold)
    w, st = t("ice_balance warm2", cold)

    # old-style f32 full-square upload for comparison
    def old_upload():
        M_host = np.zeros((P, P), np.float32)
        M_host[b1, b2] = v
        M_host = M_host + np.triu(M_host, 1).T
        Mo = jnp.asarray(M_host)
        np.asarray(Mo[0, :8])
        return Mo

    Mo = t("old f32 dense upload", old_upload)
    del Mo

    # fresh-process emulation: new ice_balance cache entry for this shape?
    t("weights download+write", lambda: r.set_weights(np.asarray(w)[:S]))


if __name__ == "__main__":
    main()
