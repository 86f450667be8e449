"""Allelic loop calling: gap file, zero-neighbor pre-filter, per-chrom
threshold path, and plotting smokes."""

import os

import numpy as np
import pytest

from hichap_master_tpu.core import Genome
from hichap_master_tpu.io import write_cooler
from hichap_master_tpu.models.loops import run_loops
from hichap_master_tpu.models.tads import run_tads
from hichap_master_tpu.io.cooler import CoolerReader


def _loop_matrix(rng, n, loops):
    i = np.arange(n)
    d = np.abs(np.subtract.outer(i, i)).astype(float)
    lam = 40.0 / (1 + d) + 0.3
    for (x, y) in loops:
        lam[max(x - 1, 0): x + 2, max(y - 1, 0): y + 2] *= 3
        lam[x, y] *= 6
    M = rng.poisson(lam).astype(float)
    return np.triu(M) + np.triu(M, 1).T


def test_allelic_loops_end_to_end(tmp_path, rng):
    n, res = 150, 40_000
    g = Genome({"1": n * res - res // 2})
    hap = g.haplotype()
    mats = {
        "M1": _loop_matrix(rng, n, [(30, 55), (80, 110)]),
        "P1": _loop_matrix(rng, n, [(40, 70)]),
    }
    path = str(tmp_path / "hap.cool")
    write_cooler(path, hap, res, mats, dtype="float")

    gap_file = str(tmp_path / "gaps.npz")
    np.savez(gap_file, **{str(res): np.array(
        {"M1": np.array([0, 1]), "P1": np.array([0])}, dtype=object)})

    final = run_loops(path, res, "Maternal", str(tmp_path / "ML"),
                      gap_file=gap_file)
    raw = (tmp_path / "ML" / "ML_Loops_40K.txt").read_text().splitlines()
    assert raw[0].startswith("chromLabel")
    # output chromosome labels are stripped of the haplotype prefix
    assert all(l.split("\t")[0] == "1" for l in raw[1:])
    found = {(int(l.split("\t")[1]) // res, int(l.split("\t")[2]) // res)
             for l in raw[1:]}
    hits = sum(1 for t in [(30, 55), (80, 110)]
               if any(abs(t[0] - f[0]) <= 1 and abs(t[1] - f[1]) <= 1
                      for f in found))
    assert hits >= 1, f"planted maternal loops not found: {found}"
    assert os.path.exists(final)
    # gap file is mandatory in allelic mode
    with pytest.raises(ValueError, match="Gap file"):
        run_loops(path, res, "Paternal", str(tmp_path / "PL"))


def test_tad_and_loop_plots_smoke(tmp_path, rng):
    n, res = 120, 40_000
    g = Genome({"1": n * res - res // 2})
    i = np.arange(n)
    same = np.equal.outer(i // 15, i // 15)
    lam = (40.0 / (1 + np.abs(np.subtract.outer(i, i)))) * np.where(same, 5, 1)
    M = rng.poisson(lam).astype(float)
    M = np.triu(M) + np.triu(M, 1).T
    path = str(tmp_path / "t.cool")
    write_cooler(path, g, res, {"1": M})
    r = CoolerReader(path, res)
    r.set_weights(np.ones(r.nbins))

    run_tads(path, res, False, str(tmp_path / "T"), min_tad=3 * res,
             max_tad=40 * res, window=6 * res, plot=True)
    assert (tmp_path / "T" / "T_TADs_Plot_40K.pdf").exists()

    run_loops(path, res, False, str(tmp_path / "L"), loop_strength=2,
              plot=True)
    pdfs = [f for f in os.listdir(tmp_path / "L") if f.endswith(".pdf")]
    assert pdfs, "loop plot PDF missing"
