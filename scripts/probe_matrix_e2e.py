"""Dissect the e2e matrix-stage wall piece by piece (host parts run
anywhere; device parts reflect the active backend).

    PERF_E2E_BED=/tmp/perf_e2e_XXXX/rep1 \
        env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/probe_matrix_e2e.py

Stages: streamed parse+bin (per-resolution accumulators), finish(),
cooler writes per resolution, then the balance walls — everything
`traditional_matrix_construction` does, but individually timed so the
1-core host share is attributable without a chip.
"""

import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402

from perf_sparse_gw import HG19  # noqa: E402

_S = int(os.environ.get("PERF_SCALE", "1"))
CHROMS = {**{str(i + 1): l // _S for i, l in enumerate(HG19[:22])},
          "X": HG19[22] // _S}
RES_LOOP, RES_TAD, RES_COMP = 10_000, 40_000, 500_000


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from hichap_master_tpu.core import Genome
    from hichap_master_tpu.io.bedio import iter_valid_bed
    from hichap_master_tpu.pipeline import matrix as pm

    rep = os.environ["PERF_E2E_BED"]
    bed = os.path.join(rep, "E2E_R1_Valid.bed")
    g = Genome(CHROMS)
    log(f"bed {os.path.getsize(bed)/2**30:.2f} GB; backend "
        f"{os.environ.get('JAX_PLATFORMS', 'device')}")

    whole_res, local_res = [RES_COMP, RES_LOOP], [RES_TAD]
    offs = {res: pm._offsets_array(g, res) for res in whole_res}
    twhole = {res: pm._GWAcc(g.total_bins(res), pm._gw_is_sparse(g, res))
              for res in whole_res}
    tlocal = {res: pm._IntraAcc(g, res) for res in local_res}

    t_gw = {r: 0.0 for r in whole_res}
    t_local = {r: 0.0 for r in local_res}
    total = 0
    t0 = time.perf_counter()
    tp = 0.0
    t = time.perf_counter()
    for c1, p1, c2, p2 in iter_valid_bed([bed], g):
        tp += time.perf_counter() - t
        total += len(c1)
        for res in whole_res:
            o = offs[res]
            tt = time.perf_counter()
            twhole[res].add_sym(p1 // res + o[c1], p2 // res + o[c2])
            t_gw[res] += time.perf_counter() - tt
        for res in local_res:
            tt = time.perf_counter()
            tlocal[res].add(c1, p1, c2, p2)
            t_local[res] += time.perf_counter() - tt
        t = time.perf_counter()
    log(f"stream pass: {time.perf_counter()-t0:.1f}s over {total/1e6:.1f}M "
        f"pairs (parse {tp:.1f}s, "
        + ", ".join(f"gw{r//1000}kb {t_gw[r]:.1f}s" for r in whole_res)
        + ", "
        + ", ".join(f"local{r//1000}kb {t_local[r]:.1f}s" for r in local_res)
        + ")")

    whole = {}
    for res in whole_res:
        t = time.perf_counter()
        whole[res] = twhole[res].finish()
        log(f"finish gw {res//1000}kb: {time.perf_counter()-t:.1f}s")
    local = {}
    for res in local_res:
        t = time.perf_counter()
        local[res] = tlocal[res].finish()
        log(f"finish local {res//1000}kb: {time.perf_counter()-t:.1f}s")

    tmp = tempfile.mkdtemp(prefix="probe_matrix_")
    path = os.path.join(tmp, "Probe_Multi.cool")
    t = time.perf_counter()
    pm._write_traditional_cooler(path, g, whole, local)
    log(f"write cooler (all res): {time.perf_counter()-t:.1f}s "
        f"({os.path.getsize(path)/2**30:.2f} GB)")

    for res, cis in [(RES_COMP, False), (RES_LOOP, False), (RES_TAD, True)]:
        t = time.perf_counter()
        pm._write_weights(path, g, res, cis_only=cis)
        log(f"balance {res//1000}kb cis={cis}: {time.perf_counter()-t:.1f}s")


if __name__ == "__main__":
    main()
