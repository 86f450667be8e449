"""Allelic-specificity tests: formula parity + end-to-end file flow."""

import numpy as np
import pytest

from hichap_master_tpu.core import Genome
from hichap_master_tpu.io import write_cooler
from hichap_master_tpu.models.specificity import (
    BoundaryAllelicSpecificity,
    CompartmentAllelicSpecificity,
    LoopAllelicSpecificity,
    single_group_stat,
)


def test_single_group_stat_formulas():
    # guards
    assert single_group_stat(0.5, 0, 10) is None
    assert single_group_stat(0.5, 10, 10) is None
    assert single_group_stat(0.01, 3, 100) is None          # p*nobs < 5
    # large-sample branch
    s = single_group_stat(0.5, 40, 100)
    assert s == pytest.approx((40 - 50) / np.sqrt(100 * 0.25))
    # continuity-corrected branch (5 <= p*nobs < 30)
    s2 = single_group_stat(0.5, 10, 40)
    assert s2 == pytest.approx((abs(10 - 20) - 0.5) / np.sqrt(40 * 0.25))


@pytest.fixture
def hap_cooler(tmp_path, rng):
    g = Genome({"1": 500_000, "2": 400_000})
    hap = g.haplotype()
    res = 10_000
    mats = {}
    for c in hap.labels:
        n = hap.n_bins(c, res)
        A = rng.poisson(8.0, (n, n)).astype(float)
        mats[c] = np.triu(A) + np.triu(A, 1).T
    # make chr1 maternal clearly stronger at one pixel pair
    mats["M1"][5, 20] = mats["M1"][20, 5] = 200.0
    mats["P1"][5, 20] = mats["P1"][20, 5] = 10.0
    path = str(tmp_path / "hap.cool")
    write_cooler(path, hap, res, mats)
    return path, res


def test_loop_specificity_end_to_end(tmp_path, rng, hap_cooler):
    path, res = hap_cooler
    loop_file = tmp_path / "loops.txt"
    lines = []
    lines.append(f"1\t{5*res}\t{20*res}\t{5*res}\t{20*res}")
    for i in range(30):
        a = int(rng.integers(1, 30))
        b = int(rng.integers(1, 30))
        lines.append(f"2\t{a*res}\t{b*res}\t{a*res}\t{b*res}")
    loop_file.write_text("\n".join(lines) + "\n")

    las = LoopAllelicSpecificity(path, str(loop_file), res)
    results = las.run(str(tmp_path / "out.txt"))
    assert (tmp_path / "out.txt").exists()
    header = (tmp_path / "out.txt").read_text().splitlines()[0].split("\t")
    assert header[:5] == ["chr", "startM", "endM", "startP", "endP"]
    # the planted strongly-maternal loop: either filtered by the 95% cap or,
    # if kept, significantly maternal
    planted = [r for r in results if r[1] == 5 * res and r[0] == "1"]
    for r in planted:
        assert r[9] != "NA" and r[9] > 2


def test_boundary_specificity_end_to_end(tmp_path, rng, hap_cooler):
    path, res = hap_cooler
    bf = tmp_path / "bounds.txt"
    rows = [f"1\t{25*res}\t{25*res}", f"1\t{20*res}\t{22*res}",
            f"2\t{20*res}\t{20*res}"]
    bf.write_text("\n".join(rows) + "\n")
    bas = BoundaryAllelicSpecificity(path, str(bf), res, offset=8)
    results = bas.run(str(tmp_path / "bout.txt"))
    assert len(results) == 3
    for r in results:
        assert np.isfinite(r[6]) and 0 <= r[6] <= 1  # p-value
        assert 0 <= r[7] <= 1                        # q-value
    txt = (tmp_path / "bout.txt").read_text().splitlines()
    assert txt[0].split("\t")[0] == "chr"


def test_compartment_specificity_end_to_end(tmp_path, rng):
    res = 100_000
    n = 60
    m = rng.normal(0, 1, n)
    p = m + rng.normal(0, 0.1, n)
    # force some discordant bins with big diffs
    p[5] = -m[5] - 2.0
    p[30] = -m[30] - 1.5
    mfile, pfile = tmp_path / "m.txt", tmp_path / "p.txt"
    mfile.write_text("".join(f"1\t{v}\n" for v in m))
    pfile.write_text("".join(f"1\t{v}\n" for v in p))
    cas = CompartmentAllelicSpecificity(str(mfile), str(pfile), res)
    results = cas.run(str(tmp_path / "cout.txt"))
    assert len(results) >= 2
    positions = [r[1] for r in results]
    assert 5 * res in positions and 30 * res in positions
    for r in results:
        assert 0 <= r[5] <= 1 and 0 <= r[6] <= 1
