"""Bed-ingestion throughput: file -> parsed columns -> device matrices.

The reference's matrix builder consumes bed files one line at a time
through Python string splits (HiCHap/matrixBuilding.py:567-603); at the
42 GB-FASTQ scale of its GM12878 example (README.md:52-55) that stage sees
hundreds of millions of contact records.  This measures the rebuild's
ingestion stack at a representative slice:

  1. parse   — pandas C reader -> columnar int32 (io/bedio.read_valid_bed)
  2. scatter — chunked device scatter-adds (ops/binning) into the
               genome-wide 500 kb matrix and the per-chromosome 40 kb
               batch (sync via a 1-element fetch; the full-matrix host
               return is a separate number — it is tunnel-bound here and
               ~free on a PCIe host)
  3. oracle  — the reference's per-line Python loop on a 200k-line sample
               (measured, then expressed as lines/s)

Usage:  python scripts/perf_ingest.py            (TPU; ~10M lines)
        PERF_LINES=2000000 JAX_PLATFORMS=cpu python scripts/perf_ingest.py
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

LINES = int(os.environ.get("PERF_LINES", "10000000"))
RES_GW, RES_LOCAL = 500_000, 40_000


def synth_bed(path: str, lines: int, chroms: dict, rng) -> None:
    """15-column traditional valid bed (filtering.py:16-47 layout); only
    columns 1/6/8/13 (chrom1, fragmid1, chrom2, fragmid2) matter to
    matrix building, the rest are realistic filler."""
    import pandas as pd

    names = np.asarray(list(chroms))
    sizes = np.asarray([chroms[c] for c in names])
    p = sizes / sizes.sum()
    ci1 = rng.choice(names.size, lines, p=p)
    pos1 = (rng.random(lines) * (sizes[ci1] - 1000)).astype(np.int64)
    # ~80% intra with power-law-ish separation, 20% trans
    intra = rng.random(lines) < 0.8
    sep = (10_000 * np.exp(rng.exponential(2.0, lines))).astype(np.int64)
    ci2 = np.where(intra, ci1, rng.choice(names.size, lines, p=p))
    pos2 = np.where(intra,
                    np.minimum(pos1 + sep, sizes[ci2] - 500),
                    (rng.random(lines) * (sizes[ci2] - 1000)).astype(
                        np.int64))
    df = pd.DataFrame({
        0: "r",  # read name stub
        1: names[ci1], 2: "+", 3: pos1, 4: 75, 5: 60,
        6: pos1 // 1000 * 1000 + 500, 7: 1,
        8: names[ci2], 9: "-", 10: pos2, 11: 75, 12: 60,
        13: pos2 // 1000 * 1000 + 500, 14: 1,
    })
    df.to_csv(path, sep="\t", header=False, index=False)


def reference_loop_rate(path: str, genome, res: int, sample: int) -> float:
    """The reference's per-line ingestion (matrixBuilding.py:567-592):
    split, chrom lookup, dense increment — measured on ``sample`` lines."""
    labels = {c: i for i, c in enumerate(genome.labels)}
    offsets = np.zeros(len(genome.labels), np.int64)
    tot = 0
    for i, c in enumerate(genome.labels):
        offsets[i] = tot
        tot += genome.n_bins(c, res)
    M = np.zeros((tot, tot), np.int32)
    t0 = time.perf_counter()
    done = 0
    with open(path) as f:
        for line in f:
            parts = line.split("\t")
            c1, c2 = parts[1], parts[8]
            if c1 not in labels or c2 not in labels:
                continue
            b1 = int(parts[6]) // res + offsets[labels[c1]]
            b2 = int(parts[13]) // res + offsets[labels[c2]]
            M[b1, b2] += 1
            if b1 != b2:
                M[b2, b1] += 1
            done += 1
            if done >= sample:
                break
    return done / (time.perf_counter() - t0)


def main():
    import tempfile

    import jax
    import jax.numpy as jnp

    cache = os.path.join(_REPO, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from perf_sparse_gw import HG19

    from hichap_master_tpu.core import Genome
    from hichap_master_tpu.core.contacts import bucket_groups
    from hichap_master_tpu.io.bedio import read_valid_bed
    from hichap_master_tpu.ops.binning import (bin_genomewide, bin_intra,
                                               stream_chunks)
    from hichap_master_tpu.pipeline.matrix import CHUNK, _offsets_array

    chroms = {**{str(i + 1): l for i, l in enumerate(HG19[:22])},
              "X": HG19[22]}
    g = Genome(chroms)
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="perf_ingest_")
    bed = os.path.join(tmp, "sample_Valid.bed")

    t0 = time.perf_counter()
    synth_bed(bed, LINES, chroms, rng)
    print(f"synth: {LINES/1e6:.0f}M lines, "
          f"{os.path.getsize(bed)/2**20:.0f} MB "
          f"({time.perf_counter()-t0:.1f} s)", flush=True)

    t0 = time.perf_counter()
    c1, p1, c2, p2 = read_valid_bed([bed], g)
    t_parse = time.perf_counter() - t0
    print(f"parse:  {LINES/t_parse/1e6:6.2f}M lines/s  ({t_parse:.1f} s)",
          flush=True)

    def timed_scatter(label, fn):
        fn()  # compile + warm
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        print(f"{label}: {LINES/dt/1e6:6.2f}M contacts/s  ({dt:.2f} s)",
              flush=True)
        return dt

    S = g.total_bins(RES_GW)
    offsets = jnp.asarray(_offsets_array(g, RES_GW))

    def gw():
        dev = jnp.zeros((S, S), jnp.float32)
        for (a, b, cc, d), valid in stream_chunks([c1, p1, c2, p2], CHUNK):
            dev = bin_genomewide(dev, jnp.asarray(a), jnp.asarray(b),
                                 jnp.asarray(cc), jnp.asarray(d), offsets,
                                 jnp.asarray(valid), RES_GW)
        np.asarray(dev[:1, :1])  # sync without the full download
        return dev

    t_gw = timed_scatter(f"genome-wide {RES_GW//1000}kb scatter", gw)

    nb = {c: g.n_bins(c, RES_LOCAL) for c in g.labels}
    label_idx = {c: i for i, c in enumerate(g.labels)}
    intra_sel = c1 == c2

    def intra():
        for group, N in bucket_groups(g.labels, nb):
            gpos = np.full(len(g.labels), -1, np.int32)
            for gi, c in enumerate(group):
                gpos[label_idx[c]] = gi
            sel = intra_sel & (gpos[c1] >= 0)
            gc = gpos[c1[sel]]
            gp1, gp2 = p1[sel], p2[sel]
            dev = jnp.zeros((len(group), N, N), jnp.float32)
            for (a, b, d), valid in stream_chunks([gc, gp1, gp2], CHUNK):
                dev = bin_intra(dev, jnp.asarray(a), jnp.asarray(b),
                                jnp.asarray(a), jnp.asarray(d),
                                jnp.asarray(valid), RES_LOCAL)
            np.asarray(dev[:1, :1, :1])

    t_local = timed_scatter(f"intra {RES_LOCAL//1000}kb batch scatter",
                            intra)

    # the production accumulate_* policy (host bincount below the cell
    # threshold — pipeline/matrix._HOST_BINCOUNT_CELLS; device scatter
    # above it / with HICHAP_HOST_BINCOUNT=0)
    from hichap_master_tpu.pipeline.matrix import (accumulate_genomewide,
                                                   accumulate_intra)

    def gw_policy():
        accumulate_genomewide(c1, p1, c2, p2, g, RES_GW)

    t_gw_pol = timed_scatter(f"genome-wide {RES_GW//1000}kb policy",
                             gw_policy)
    timed_scatter(f"intra {RES_LOCAL//1000}kb policy",
                  lambda: accumulate_intra(c1, p1, c2, p2, g, RES_LOCAL))

    ref = reference_loop_rate(bed, g, RES_GW, sample=200_000)
    e2e = LINES / (t_parse + min(t_gw, t_gw_pol))
    print(f"reference per-line loop (200k sample): {ref/1e6:6.3f}M lines/s",
          flush=True)
    print(f"end-to-end (parse + genome-wide): {e2e/1e6:6.2f} M lines/s "
          f"-> {e2e/ref:.0f}x the reference loop", flush=True)


if __name__ == "__main__":
    main()
