"""Filtering stage at production scale: chunk beds → external sort →
k-way merge → blockwise dedup/SC/DE/UM/ED classification → Valid bed.

The reference's HiC_Filtering is a per-line Python loop over an external
sort (HiCHap/filtering.py:77-267); this measures our native-sort +
vectorized-blocks equivalent at tens of millions of records on real hg19
coordinates — the last pipeline stage without an at-scale number.

    PERF_FILT_LINES=20000000 PERF_FILT_CHUNKS=4 \
        env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/perf_filtering.py

Generation is untimed setup; reuse with PERF_FILT_BED=<dir>.
"""

import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "scripts"))

import numpy as np  # noqa: E402

from perf_sparse_gw import HG19  # noqa: E402

N_LINES = int(float(os.environ.get("PERF_FILT_LINES", "20000000")))
N_CHUNKS = int(os.environ.get("PERF_FILT_CHUNKS", "4"))
FRAG = 4_000  # synthetic fragment grid
DUP_FRAC = 0.03

CHROMS = {**{str(i + 1): l for i, l in enumerate(HG19[:22])}, "X": HG19[22]}


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _chunk_lines(rng, n, tag):
    import pandas as pd

    labels = np.array(list(CHROMS), dtype=object)
    sizes = np.array(list(CHROMS.values()), np.int64)
    w = sizes / sizes.sum()
    c1 = rng.choice(len(labels), n, p=w)
    intra = rng.random(n) < 0.7
    c2 = np.where(intra, c1, rng.choice(len(labels), n, p=w))
    p1 = (rng.random(n) * sizes[c1]).astype(np.int64) + 1
    d = np.abs(rng.standard_cauchy(n) * 150_000).astype(np.int64)
    p2 = np.where(intra, np.minimum(p1 + d, sizes[c1] - 1),
                  (rng.random(n) * sizes[c2]).astype(np.int64) + 1)
    s1 = rng.choice([0, 16], n)
    s2 = rng.choice([0, 16], n)
    # inject duplicates: copy a slice of earlier rows under new names
    nd = int(n * DUP_FRAC)
    if nd:
        src = rng.integers(0, n - nd, nd)
        for a in (c1, c2, p1, p2, s1, s2):
            a[n - nd:] = a[src]
    f1 = (p1 // FRAG) * FRAG
    f2 = (p2 // FRAG) * FRAG
    df = pd.DataFrame({
        0: [f"{tag}r{k}" for k in range(n)], 1: labels[c1], 2: s1, 3: p1,
        4: 100, 5: -5, 6: f1, 7: 0,
        8: labels[c2], 9: s2, 10: p2, 11: 100, 12: -7, 13: f2, 14: 0,
    })
    return df


def generate(bed_dir):
    import pandas as pd  # noqa: F401

    os.makedirs(bed_dir, exist_ok=True)
    rng = np.random.default_rng(7)
    per = N_LINES // N_CHUNKS
    for i in range(N_CHUNKS):
        df = _chunk_lines(rng, per, f"c{i}")
        df.to_csv(os.path.join(bed_dir, f"cell_chunk{i}.bed"), sep="\t",
                  header=False, index=False)
        log(f"  wrote chunk{i}: {per/1e6:.1f}M lines")


def main():
    from hichap_master_tpu.pipeline.filtering import hic_filtering

    bed_dir = os.environ.get("PERF_FILT_BED")
    if bed_dir and not (os.path.isdir(bed_dir) and any(
            f.endswith(".bed") for f in os.listdir(bed_dir))):
        # fixed reuse dir named but not yet populated: generate into it
        os.makedirs(bed_dir, exist_ok=True)
        log(f"generating {N_LINES/1e6:.0f}M chunk-bed lines (untimed) → "
            f"{bed_dir}")
        generate(bed_dir)
    elif not bed_dir or not os.path.isdir(bed_dir):
        bed_dir = tempfile.mkdtemp(prefix="perf_filt_")
        log(f"generating {N_LINES/1e6:.0f}M chunk-bed lines (untimed) → "
            f"{bed_dir}")
        generate(bed_dir)
    gb = sum(os.path.getsize(os.path.join(bed_dir, f))
             for f in os.listdir(bed_dir) if f.endswith(".bed")) / 2**30
    out_dir = tempfile.mkdtemp(prefix="perf_filt_out_")
    log(f"filtering {gb:.2f} GB of chunk beds")
    t0 = time.perf_counter()
    stats = hic_filtering(bed_dir, out_dir, clean=False)
    wall = time.perf_counter() - t0
    rate = stats["Total"] / max(wall, 1e-9)
    log(f"hic_filtering: {wall:.1f} s over {stats['Total']/1e6:.1f}M "
        f"records ({rate/1e6:.2f} M rec/s)")
    log(f"stats: {stats}")
    rec = {"filtering_s": round(wall, 1), "records": stats["Total"],
           "rec_per_s": round(rate), "gb": round(gb, 2), **stats}
    with open(os.path.join(_REPO, ".perf_filtering.json"), "w") as f:
        json.dump(rec, f)
    log("written to .perf_filtering.json")


if __name__ == "__main__":
    main()
