"""Filtering layer unit tests: SC/DE/UM/ED classification, dedup, allelic
assignment rules."""

import numpy as np
import pytest

from hichap_master_tpu.pipeline.filtering import (
    MAX_DIFF_SCORE,
    _both_mapping,
    _specific_mapping,
    _sub_search,
    hic_filtering,
)


def _bed(name, c1, s1, p1, f1, c2, s2, p2, f2, snp1=0, snp2=0):
    return "\t".join(map(str, [
        name, c1, s1, p1, 100, -5, f1, snp1,
        c2, s2, p2, 100, -7, f2, snp2])) + "\n"


def test_classification_rules(tmp_path, rng):
    bed_dir = tmp_path / "beds"
    out_dir = tmp_path / "out"
    bed_dir.mkdir()
    lines = [
        # valid: different chromosome
        _bed("v1", "1", 0, 100, 500, "2", 16, 300, 700),
        # valid: same chrom, far apart, diff fragments
        _bed("v2", "1", 0, 100, 500, "1", 16, 90_000, 90_500),
        # SC: same fragment, pos1<pos2, strands 16/0
        _bed("sc", "1", 16, 100, 500, "1", 0, 300, 500),
        # DE: same fragment, pos1<pos2, strands 0/16
        _bed("de", "1", 0, 100, 500, "1", 16, 300, 500),
        # UM: same fragment, same strand
        _bed("um", "1", 0, 100, 500, "1", 0, 300, 500),
        # ED: diff fragment, facing, <=500 bp apart
        _bed("ed", "1", 0, 100, 500, "1", 16, 450, 900),
        # duplicate of v1 (identical key)
        _bed("dup", "1", 0, 100, 500, "2", 16, 300, 700),
    ]
    (bed_dir / "cell_chunk0.bed").write_text("".join(lines))
    stats = hic_filtering(str(bed_dir), str(out_dir), "NonAllelic",
                          clean=False)
    assert stats["Total"] == 7
    assert stats["Duplicates"] == 1
    assert stats["SelfCircle"] == 1
    assert stats["DanglingEnds"] == 1
    assert stats["UnknownMechanism"] == 1
    assert stats["ExtraDanglingEnds"] == 1
    assert stats["Valid"] == 2
    out = (out_dir / "cell_Valid.bed").read_text().splitlines()
    assert len(out) == 2


def test_sub_search_rules():
    # same position: SNP dominance (strict >2x)
    assert _sub_search("1", 100, -5, 3, "1", 102, -5, 1) == "M"
    assert _sub_search("1", 100, -5, 1, "1", 102, -5, 3) == "P"
    assert _sub_search("1", 100, -5, 2, "1", 102, -5, 1) == "N"
    # different position: AS gap >= 18 AND SNPs >= 2x
    assert _sub_search("1", 100, 0, 2, "1", 5000, -20, 1) == "M"
    assert _sub_search("1", 100, 0, 2, "1", 5000, -17, 1) == "N"  # gap < 18
    assert _sub_search("1", 100, -20, 1, "1", 5000, 0, 2) == "P"
    # different chromosome counts as different position
    assert _sub_search("1", 100, 0, 4, "2", 100, -30, 1) == "M"


def _info15(snp1, snp2, c1="1", c2="1", f1=500, f2=1500, score=-5, pos1=100,
            pos2=2000):
    return list(map(str, ["p", c1, 0, pos1, 100, score, f1, snp1,
                          c2, 16, pos2, 100, score, f2, snp2]))


def test_specific_mapping_branches():
    mark, lines = _specific_mapping(_info15(2, 3))
    assert mark == "Both" and lines[-1] == "Both"
    mark, lines = _specific_mapping(_info15(2, 0))
    assert mark == "R1"
    mark, lines = _specific_mapping(_info15(0, 2))
    assert mark == "R2"
    mark, lines = _specific_mapping(_info15(0, 0))
    assert mark == "N" and len(lines) == 4
    # candidate rescue: R2 candidate shares mate2's fragment, has SNPs
    info = _info15(2, 0) + list(map(str, ["1", 0, 2100, 30, -3, 1500, 1,
                                          "R2"]))
    mark, lines = _specific_mapping(info)
    assert mark == "Both"
    assert lines[:4] == [info[1], info[6], info[15], info[20]]


def test_both_mapping_assignment():
    # M clearly wins mate1 (same pos, 3 > 2*1 SNPs); mate2 tie
    m = _info15(3, 0)
    p = _info15(1, 0, pos1=102)
    mark, lines = _both_mapping(m, p)
    assert mark == "MN"
    # both mates P: scores diverge by >= MAX_DIFF_SCORE with SNP dominance
    m = _info15(0, 0, score=-30)
    p = _info15(2, 2, score=-30 + MAX_DIFF_SCORE, pos1=9000, pos2=9500)
    mark, lines = _both_mapping(m, p)
    assert mark == "PP"
    # neither distinguishable -> Bi-allelic
    mark, _ = _both_mapping(_info15(1, 1), _info15(1, 1, pos1=101, pos2=2001))
    assert mark == "NN"
