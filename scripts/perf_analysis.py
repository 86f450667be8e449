"""Analysis-pipeline wall-time probe at BASELINE configs (real TPU).

Times compartment / TAD / loop calling on synthetic chromosome-scale data:
  - compartments at 500 kb genome-wide scale (6.2k bins)
  - TAD calling at 40 kb on a chr1-scale matrix (6.2k bins)
  - loop calling at 10 kb on a chr-scale matrix (configurable bins)

Writes PERF.md-ready numbers to stdout.  Run: python scripts/perf_analysis.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    if os.environ.get("PERF_WARM", "1") == "1":
        t0 = time.perf_counter()
        fn()
        warm = time.perf_counter() - t0
        print(f"{label:45s} {dt:8.2f} s (warm {warm:6.2f} s)", flush=True)
    else:
        print(f"{label:45s} {dt:8.2f} s", flush=True)
    return out, dt


def synth_cooler(tmp, name, n_bins, res, rng, tad_size=0, loops=0):
    from hichap_master_tpu.core import Genome
    from hichap_master_tpu.io import CoolerReader, write_cooler

    i = np.arange(n_bins)
    d = np.abs(np.subtract.outer(i, i)) + 1.0
    lam = 80.0 / d**0.9
    if tad_size:
        same = np.equal.outer(i // tad_size, i // tad_size)
        lam = lam * np.where(same, 4.0, 1.0)
    M = rng.poisson(lam).astype(np.float32)
    M = np.triu(M) + np.triu(M, 1).T
    if loops:
        for _ in range(loops):
            x = int(rng.integers(5, n_bins - 60))
            y = x + int(rng.integers(10, 50))
            M[x, y] = M[y, x] = M[x, y] * 8 + 60
    g = Genome({"1": n_bins * res - res // 2})
    path = os.path.join(tmp, name)
    write_cooler(path, g, res, {"1": M})
    r = CoolerReader(path, res)
    r.set_weights(np.ones(r.nbins))
    return path


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    from hichap_master_tpu.models.compartment import run_compartment
    from hichap_master_tpu.models.loops import run_loops
    from hichap_master_tpu.models.tads import run_tads

    import tempfile
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="perf_")
    print(f"devices: {jax.devices()}", flush=True)

    n_loop_bins = int(os.environ.get("PERF_LOOP_BINS", "6144"))

    c500 = synth_cooler(tmp, "c500.cool", 6208, 500_000, rng)
    c40 = synth_cooler(tmp, "c40.cool", 6208, 40_000, rng, tad_size=20)
    c10 = synth_cooler(tmp, "c10.cool", n_loop_bins, 10_000, rng,
                       tad_size=0, loops=60)

    timed("compartment 500kb genome-scale (6208 bins)",
          lambda: run_compartment(c500, 500_000, False,
                                  os.path.join(tmp, "PC")))
    timed("TADs 40kb chr1-scale (6208 bins)",
          lambda: run_tads(c40, 40_000, False, os.path.join(tmp, "TAD"),
                           plot=False))
    timed(f"loops 10kb ({n_loop_bins} bins)",
          lambda: run_loops(c10, 10_000, False, os.path.join(tmp, "LP"),
                            loop_strength=8))
    from hichap_master_tpu.utils.profiling import metrics
    print("stage metrics:", {k: round(v, 2) for k, v in metrics().items()},
          flush=True)


if __name__ == "__main__":
    main()
