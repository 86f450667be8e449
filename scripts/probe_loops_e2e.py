"""Stage-time run_loops's pieces on a REAL e2e cooler (the 1351 s warm
wall): fetch_coo, dense host matrix(), weights, pcaller_multi, selection,
clustering.  Writes /tmp/probe_loops_e2e.log.

    PROBE_COOL=/tmp/perf_e2e_ovvvez2w/Matrix/Cooler/Merged_Multi.cool \
        timeout 3000 python scripts/probe_loops_e2e.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = open("/tmp/probe_loops_e2e.log", "a", buffering=1)
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
    from hichap_master_tpu.models.loops import (loop_cluster, loop_selecting,
                                                pcaller_multi,
                                                peaks_parameters)

    cool = os.environ.get(
        "PROBE_COOL", "/tmp/perf_e2e_ovvvez2w/Matrix/Cooler/Merged_Multi.cool")
    res = 10_000
    reader = CoolerReader(cool, res)
    chroms = reader.chromnames
    params = peaks_parameters(res)

    t = time.perf_counter()
    inputs = {}
    for chro in chroms:
        rows, cols, vals = reader.fetch_coo(chro)
        ci = reader.chromnames.index(chro)
        n = int(reader.chrom_offset[ci + 1] - reader.chrom_offset[ci])
        wt = reader.bins_weight(chro)
        inputs[chro] = (rows, cols, vals, wt, n)
    log(f"fetch_coo+weights all 23: {time.perf_counter()-t:.1f}s "
        f"({sum(len(v[0]) for v in inputs.values())/1e6:.1f}M pixels)")

    t = time.perf_counter()
    matrices = {}
    if os.environ.get("PROBE_DENSE") == "1":  # the pre-CSR production path
        for chro in chroms:
            matrices[chro] = reader.matrix(chro, balance=False)
        gb = sum(m.nbytes for m in matrices.values()) / 2**30
        kind = f"dense {next(iter(matrices.values())).dtype}"
    else:
        from hichap_master_tpu.models.loops import _sym_csr
        for chro in chroms:
            rows, cols, vals, _wt, n = inputs[chro]
            matrices[chro] = _sym_csr(rows, cols, vals, n)
        gb = sum(m.data.nbytes + m.indices.nbytes + m.indptr.nbytes
                 for m in matrices.values()) / 2**30
        kind = "csr f32"
    dt = time.perf_counter() - t
    log(f"post-stage matrix cache ({kind}) all 23: {dt:.1f}s ({gb:.1f} GB)")

    t = time.perf_counter()
    results = pcaller_multi(inputs, res, params, allelic=False, gaps={})
    log(f"pcaller_multi: {time.perf_counter()-t:.1f}s "
        f"({sum(len(d) for d, _ in results.values())} candidates)")

    # selection + clustering on the candidate file from the e2e run
    loops_txt = os.environ.get(
        "PROBE_LOOPS", "/tmp/perf_e2e_ovvvez2w/Loops/Loops_Loops_10K.txt")
    if os.path.exists(loops_txt):
        sel = "/tmp/probe_sel.txt"
        t = time.perf_counter()
        loop_selecting(matrices, res, loops_txt, sel)
        log(f"loop_selecting: {time.perf_counter()-t:.1f}s")
        t = time.perf_counter()
        loop_cluster(matrices, res, sel, False)
        log(f"loop_cluster: {time.perf_counter()-t:.1f}s")


if __name__ == "__main__":
    main()
