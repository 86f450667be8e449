"""Vectorized allelic assignment must produce identical beds + stats to the
row-wise reference-faithful path."""

import os

import numpy as np
import pytest

from hichap_master_tpu.pipeline.filtering import allelic_filtering


def _row(rng, name, n_cols=15, snp_max=4):
    c1 = str(rng.integers(1, 5))
    c2 = str(rng.integers(1, 5))
    base = [name, c1, "0", str(rng.integers(1, 10**6)), "100",
            str(-rng.integers(0, 40)), str(rng.integers(1, 10**6)),
            str(rng.integers(0, snp_max)),
            c2, "16", str(rng.integers(1, 10**6)), "100",
            str(-rng.integers(0, 40)), str(rng.integers(1, 10**6)),
            str(rng.integers(0, snp_max))]
    if n_cols == 23:
        cand_mate = rng.choice(["R1", "R2"])
        # half the candidates share chrom+frag with their mate (usable)
        if rng.random() < 0.5:
            if cand_mate == "R1":
                cc, cf = base[1], base[6]
            else:
                cc, cf = base[8], base[13]
        else:
            cc, cf = str(rng.integers(1, 5)), str(rng.integers(1, 10**6))
        base += [cc, "0", str(rng.integers(1, 10**6)), "30",
                 str(-rng.integers(0, 40)), cf,
                 str(rng.integers(0, snp_max)), cand_mate]
    return "\t".join(base)


def _gen_beds(tmp_path, rng, tag, n=400):
    m_lines, p_lines = [], []
    for i in range(n):
        name = f"pair{i:05d}"
        in_m = rng.random() < 0.8
        in_p = rng.random() < 0.8
        if not (in_m or in_p):
            in_m = True
        if in_m:
            cols = 23 if rng.random() < 0.25 else 15
            m_lines.append(_row(rng, name, cols))
        if in_p:
            cols = 23 if rng.random() < 0.25 else 15
            p_lines.append(_row(rng, name, cols))
    m_bed = tmp_path / f"{tag}_Maternal_Valid.bed"
    p_bed = tmp_path / f"{tag}_Paternal_Valid.bed"
    m_bed.write_text("\n".join(m_lines) + "\n")
    p_bed.write_text("\n".join(p_lines) + "\n")
    return str(m_bed), str(p_bed)


@pytest.mark.parametrize("save_id", [False, True])
def test_vectorized_matches_rowwise(tmp_path, rng, save_id):
    # 3000 pairs with 25% candidate rows exercises every retry branch:
    # one-sided usable/unusable candidates, both-sided with mixed tags
    # (the maternal-tag-picks-the-mate quirk), and the rescue upgrades
    m1, p1 = _gen_beds(tmp_path, rng, "a", n=3000)
    # sorting deletes inputs? no — sort_file writes a temp; inputs persist
    out_v = tmp_path / "vec"
    out_r = tmp_path / "row"
    rep_v = allelic_filtering(m1, p1, str(out_v), save_id=save_id,
                              vectorized=True)
    rep_r = allelic_filtering(m1, p1, str(out_r), save_id=save_id,
                              vectorized=False)
    assert rep_v == rep_r
    for kind in ("Bi_Allelic", "M_M", "P_P", "M_P", "P_M"):
        fv = next(str(out_v / f) for f in os.listdir(out_v) if kind in f)
        fr = next(str(out_r / f) for f in os.listdir(out_r) if kind in f)
        lv = sorted(open(fv).read().splitlines())
        lr = sorted(open(fr).read().splitlines())
        assert lv == lr, f"{kind} differs: {lv[:3]} vs {lr[:3]}"
