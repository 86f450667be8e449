"""Allelic assignment at production scale: name-sorted maternal/paternal
valid beds → merge-join → the five allelic bed classes.

The reference's aFiltering is a per-pair Python walk over two whole-line-
sorted beds (HiCHap/filtering.py:989-1291); this measures our native
name-sort + vectorized merge-join at millions of pairs — with a
candidate share matching the reference's rescued-read flow.

    PERF_ALLELIC_PAIRS=10000000 \
        env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/perf_allelic.py

Generation is untimed; reuse with PERF_ALLELIC_BED=<dir>.
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

N_PAIRS = int(float(os.environ.get("PERF_ALLELIC_PAIRS", "10000000")))
CAND_FRAC = 0.05
CHROMS = {**{str(i + 1): l for i, l in enumerate(HG19[:22])}, "X": HG19[22]}


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _side_frame(rng, names, labels, sizes):
    import pandas as pd

    n = len(names)
    c1 = rng.integers(0, len(labels), n)
    c2 = rng.integers(0, len(labels), n)
    p1 = (rng.random(n) * sizes[c1]).astype(np.int64) + 1
    p2 = (rng.random(n) * sizes[c2]).astype(np.int64) + 1
    return pd.DataFrame({
        0: names, 1: labels[c1], 2: 0, 3: p1, 4: 100,
        5: -rng.integers(0, 40, n), 6: (p1 // 4000) * 4000,
        7: rng.integers(0, 4, n),
        8: labels[c2], 9: 16, 10: p2, 11: 100,
        12: -rng.integers(0, 40, n), 13: (p2 // 4000) * 4000,
        14: rng.integers(0, 4, n),
    })


def _with_candidates(rng, df, labels, sizes):
    """Append candidate columns 15-22 to a copy of df's rows."""
    import pandas as pd

    n = len(df)
    usable = rng.random(n) < 0.5
    mate = np.where(rng.random(n) < 0.5, "R1", "R2")
    cc = np.where(usable, np.where(mate == "R1", df[1], df[8]),
                  labels[rng.integers(0, len(labels), n)])
    cf = np.where(usable, np.where(mate == "R1", df[6], df[13]),
                  rng.integers(1, 10**6, n))
    out = df.copy()
    out[15] = cc
    out[16] = 0
    out[17] = rng.integers(1, 10**6, n)
    out[18] = 30
    out[19] = -rng.integers(0, 40, n)
    out[20] = cf
    out[21] = rng.integers(0, 4, n)
    out[22] = mate
    return out


def generate(bed_dir):
    os.makedirs(bed_dir, exist_ok=True)
    rng = np.random.default_rng(11)
    labels = np.array(list(CHROMS), dtype=object)
    sizes = np.array(list(CHROMS.values()), np.int64)
    names = np.array([f"pair{i:09d}" for i in range(N_PAIRS)], dtype=object)
    for side in ("Maternal", "Paternal"):
        present = rng.random(N_PAIRS) < 0.8
        df = _side_frame(rng, names[present], labels, sizes)
        cand = rng.random(len(df)) < CAND_FRAC
        path = os.path.join(bed_dir, f"CELL_R1_{side}_Valid.bed")
        df[~cand].to_csv(path, sep="\t", header=False, index=False)
        _with_candidates(rng, df[cand].reset_index(drop=True), labels,
                         sizes).to_csv(path, sep="\t", header=False,
                                       index=False, mode="a")
        log(f"  wrote {side}: {len(df)/1e6:.1f}M rows "
            f"({int(cand.sum())/1e6:.2f}M with candidates)")


def main():
    from hichap_master_tpu.pipeline.filtering import allelic_filtering

    bed_dir = os.environ.get("PERF_ALLELIC_BED")
    if bed_dir and not os.path.exists(
            os.path.join(bed_dir, "CELL_R1_Paternal_Valid.bed")):
        # fixed reuse dir named but not yet populated: generate into it
        os.makedirs(bed_dir, exist_ok=True)
        log(f"generating {N_PAIRS/1e6:.0f}M pairs (untimed) → {bed_dir}")
        generate(bed_dir)
    elif not bed_dir or not os.path.isdir(bed_dir):
        bed_dir = tempfile.mkdtemp(prefix="perf_allelic_")
        log(f"generating {N_PAIRS/1e6:.0f}M pairs (untimed) → {bed_dir}")
        generate(bed_dir)
    m = os.path.join(bed_dir, "CELL_R1_Maternal_Valid.bed")
    p = os.path.join(bed_dir, "CELL_R1_Paternal_Valid.bed")
    gb = (os.path.getsize(m) + os.path.getsize(p)) / 2**30
    out_dir = tempfile.mkdtemp(prefix="perf_allelic_out_")
    log(f"allelic assignment over {gb:.2f} GB")
    t0 = time.perf_counter()
    stats = allelic_filtering(m, p, out_dir)
    wall = time.perf_counter() - t0
    total = sum(v for k, v in stats.items()
                if k in ("Bi_Allelic", "Both_M", "Both_P", "Single_M",
                         "Single_P"))
    log(f"allelic_filtering: {wall:.1f} s ({N_PAIRS/1e6:.0f}M pairs, "
        f"{N_PAIRS/max(wall,1e-9)/1e6:.2f} M pairs/s)")
    log(f"stats: {stats}")
    rec = {"allelic_s": round(wall, 1), "pairs": N_PAIRS, "gb": round(gb, 2),
           **{k: (round(v, 4) if isinstance(v, float) else int(v))
              for k, v in stats.items()}}
    with open(os.path.join(_REPO, ".perf_allelic.json"), "w") as f:
        json.dump(rec, f)
    log("written to .perf_allelic.json")


if __name__ == "__main__":
    main()
