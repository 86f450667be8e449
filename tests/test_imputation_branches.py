"""Inter-chromosomal imputation branch semantics at the builder level.

Pins the corrected R1/R2 + M/P branch behavior (DIVERGENCES D1/D2): the
known mate's bin is the row, the same-haplotype candidate is preferred, and
each position bins against its own chromosome's offset.
"""

import numpy as np
import pytest

from hichap_master_tpu.core import Genome
from hichap_master_tpu.pipeline.matrix import build_haplotype_datasets

RES = 100_000
REGION = 300_000  # L = 3


def _write(rep, kind, lines):
    (rep / f"T_Valid_{kind}.bed").write_text(
        "\n".join(lines) + "\n" if lines else "")


@pytest.fixture
def genome():
    return Genome({"1": 1_000_000, "2": 1_000_000})


def _run(tmp_path, mm_lines, pp_lines):
    rep = tmp_path / "beds"
    rep.mkdir()
    _write(rep, "M_M", mm_lines)
    _write(rep, "P_P", pp_lines)
    for kind in ("Bi_Allelic", "M_P", "P_M"):
        _write(rep, kind, ["1\t100\t2\t200"])
    g = Genome({"1": 1_000_000, "2": 1_000_000})
    data = build_haplotype_datasets(str(rep), g, [RES], [],
                                    imputation_region=REGION,
                                    imputation_min=2,
                                    imputation_ratio=0.9)
    return (data["UnImputated_Whole"][RES], data["Imputated_Whole"][RES], g)


def test_mm_r1_inter_vote_lands_on_same_haplotype(tmp_path, genome):
    # hap bins: M1=[0,10], M2=[11,21], P1=[22,32], P2=[33,43]
    # background M_M Both contacts clustered around (M1 bin 5, M2 bin 16)
    bg = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            p1 = (5 + dx) * RES + 10
            p2 = (5 + dy) * RES + 10  # chr2 local bin 5 → hap bin 16
            bg.append(f"1\t{p1}\t2\t{p2}\tBoth")
    bg = bg * 2  # make the disk sum comfortably >= min_count
    single = [f"1\t{5*RES+10}\t2\t{5*RES+10}\tR1"]
    U, I, g = _run(tmp_path, bg + single, [])
    diff = I - U
    assert diff.sum() == 1
    r, c = np.argwhere(diff == 1)[0]
    assert (r, c) == (5, 16), f"vote landed at {(r, c)}"


def test_mm_r2_uses_own_chromosome_offsets(tmp_path, genome):
    # same background; single-side R2: mate2 (chr2) is the known M side.
    bg = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            bg.append(f"1\t{(5+dx)*RES+10}\t2\t{(5+dy)*RES+10}\tBoth")
    bg = bg * 2
    single = [f"1\t{5*RES+10}\t2\t{5*RES+10}\tR2"]
    U, I, g = _run(tmp_path, bg + single, [])
    diff = I - U
    assert diff.sum() == 1
    r, c = np.argwhere(diff == 1)[0]
    # known row = mate2's bin on M2 (hap bin 16); imputed col = mate1 on M1
    assert (r, c) == (16, 5), f"vote landed at {(r, c)}"


def test_pp_r1_fixed_branch(tmp_path, genome):
    # background P_P Both around (P1 bin 5 -> hap 27, P2 bin 5 -> hap 38)
    bg = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            bg.append(f"1\t{(5+dx)*RES+10}\t2\t{(5+dy)*RES+10}\tBoth")
    bg = bg * 2
    single = [f"1\t{5*RES+10}\t2\t{5*RES+10}\tR1"]
    U, I, g = _run(tmp_path, [], bg + single)
    diff = I - U
    assert diff.sum() == 1
    r, c = np.argwhere(diff == 1)[0]
    # reference's buggy branch would write [27, 33+5=38] only by accident of
    # its stale variables; the corrected vote prefers the same-haplotype
    # target: row = P1 bin 27, col = P2 bin 38
    assert (r, c) == (27, 38), f"vote landed at {(r, c)}"


def test_vote_fails_without_background(tmp_path, genome):
    single = [f"1\t{5*RES+10}\t2\t{5*RES+10}\tR1",
              f"1\t{100}\t1\t{200}\tBoth"]
    U, I, g = _run(tmp_path, single, [])
    # no neighborhood support → no imputation (intra Both counted in U only)
    np.testing.assert_array_equal(U, I)
