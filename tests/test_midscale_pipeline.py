"""Mid-scale hermetic pipeline test: ~10^5 pairs across 4 chunks and both
haplotypes, asserting the allelic statistics against a direct recount of
the output beds and the matrix totals against a direct recount of the
binned contacts (reference invariants: HiCHap/filtering.py:1249-1266).

This is the chunk-boundary / streaming-path stress the 200-pair e2e can't
provide: multi-chunk external sort + blockwise dedup, the vectorized
merge-join at volume, and cooler totals straight from the beds.
"""

import os
from collections import Counter

import numpy as np
import pytest

from hichap_master_tpu.core import Genome
from hichap_master_tpu.io import CoolerReader
from hichap_master_tpu.pipeline.filtering import (allelic_filtering,
                                                  hic_filtering)
from hichap_master_tpu.pipeline.matrix import haplotype_matrix_construction

N_PAIRS = 100_000
N_CHUNKS = 4
CHROMS = {"1": 4_000_000, "2": 4_000_000, "3": 4_000_000, "4": 4_000_000}
LABELS = list(CHROMS)


def _row(name, c1, s1, p1, score1, f1, snp1, c2, s2, p2, score2, f2, snp2):
    return "\t".join(map(str, [
        name, c1, s1, p1, 100, score1, f1, snp1,
        c2, s2, p2, 100, score2, f2, snp2])) + "\n"


def _make_chunks(rng, bed_dir):
    """Both-haplotype chunk beds with unique dedup keys, mixed intra/inter
    contacts, and per-mate SNP/score patterns spanning every allelic rule."""
    os.makedirs(bed_dir, exist_ok=True)
    handles_m = [open(os.path.join(bed_dir, f"cell_chunk{i}_Maternal.bed"),
                      "w") for i in range(N_CHUNKS)]
    handles_p = [open(os.path.join(bed_dir, f"cell_chunk{i}_Paternal.bed"),
                      "w") for i in range(N_CHUNKS)]

    # per-mate allelic patterns: (m_snp, p_snp, score_m, score_p, shift_p)
    # shift_p displaces the paternal position beyond the ±5 same-pos window
    PATTERNS = [
        ("M", 3, 1, -5, -5, 0),      # same pos, SNP dominance → M
        ("P", 0, 1, -5, -5, 0),      # same pos → P
        ("N", 1, 1, -5, -5, 0),      # same pos, no dominance → N
        ("M", 2, 0, -5, -30, 100),   # diff pos, score gap ≥ 18 → M
        ("P", 0, 2, -30, -5, 100),   # diff pos → P
        ("N", 1, 1, -5, -10, 100),   # diff pos, gap < 18 → N
    ]

    n_both = int(N_PAIRS * 0.7)
    n_spec = (N_PAIRS - n_both) // 2  # per haplotype
    cat_both = rng.integers(0, len(PATTERNS), (n_both, 2))
    # specific-pair SNP combos: Both / R1 / R2 / N
    spec_combo = rng.integers(0, 4, (2 * n_spec,))
    SNPS = [(1, 2), (1, 0), (0, 2), (0, 0)]

    def coords(i):
        """Unique (never-duplicate) positions; half intra, half inter."""
        c1 = LABELS[i % 4]
        p1 = (i // 4) * 38 + 1001
        if i % 2:
            c2, p2 = c1, p1 + 2000 + (i % 7) * 97
        else:
            c2 = LABELS[(i + 1) % 4]
            p2 = (i // 4) * 38 + 2003
        s1, s2 = ("0", "16") if i % 3 else ("16", "0")
        return c1, s1, p1, c2, s2, p2

    for i in range(n_both):
        c1, s1, p1, c2, s2, p2 = coords(i)
        f1, f2 = (p1 // 500) * 500, (p2 // 500) * 500
        mk1 = PATTERNS[cat_both[i, 0]]
        mk2 = PATTERNS[cat_both[i, 1]]
        name = f"b{i}"
        handles_m[i % N_CHUNKS].write(_row(
            name, c1, s1, p1, mk1[3], f1, mk1[1],
            c2, s2, p2, mk2[3], f2, mk2[1]))
        handles_p[i % N_CHUNKS].write(_row(
            name, c1, s1, p1 + mk1[5], mk1[4], f1, mk1[2],
            c2, s2, p2 + mk2[5], mk2[4], f2, mk2[2]))

    for k in range(2 * n_spec):
        i = n_both + k
        c1, s1, p1, c2, s2, p2 = coords(i)
        f1, f2 = (p1 // 500) * 500, (p2 // 500) * 500
        snp1, snp2 = SNPS[spec_combo[k]]
        side = handles_m if k < n_spec else handles_p
        tag = "m" if k < n_spec else "p"
        side[i % N_CHUNKS].write(_row(
            f"s{tag}{k}", c1, s1, p1, -5, f1, snp1,
            c2, s2, p2, -5, f2, snp2))

    for h in handles_m + handles_p:
        h.close()
    return n_both, n_spec


def _bed_contacts(path, tagged):
    """Parse an allelic bed → (c1, b1loc... raw columns)."""
    rows = []
    with open(path) as f:
        for line in f:
            p = line.split()
            if tagged:
                rows.append((p[0], int(p[1]), p[2], int(p[3]), p[4]))
            else:
                rows.append((p[0], int(p[1]), p[2], int(p[3]), None))
    return rows


@pytest.mark.slow
def test_midscale_allelic_stats_and_matrix_totals(tmp_path, rng):
    bed_dir = tmp_path / "UniqRawBed"
    n_both, n_spec = _make_chunks(rng, str(bed_dir))

    filt = tmp_path / "Filtered_Bed"
    s_m = hic_filtering(str(bed_dir), str(filt), "Maternal", clean=False,
                        block_lines=30_000)
    s_p = hic_filtering(str(bed_dir), str(filt), "Paternal", clean=False,
                        block_lines=30_000)

    # every generated pair has a unique key and a valid geometry
    assert s_m["Total"] == n_both + n_spec
    assert s_p["Total"] == n_both + n_spec
    for s in (s_m, s_p):
        assert s["Duplicates"] == 0
        assert s["Valid"] == s["Total"] - s["SelfCircle"] - s["DanglingEnds"] \
            - s["UnknownMechanism"] - s["ExtraDanglingEnds"]
        assert s["Valid"] == s["Total"]

    m_bed = str(filt / "cell_Maternal_Valid.bed")
    p_bed = str(filt / "cell_Paternal_Valid.bed")
    allelic_dir = tmp_path / "Allelic_Bed"
    rep = allelic_filtering(m_bed, p_bed, str(allelic_dir))

    # ---- 16-entry stats vs a direct recount of the five output beds ----
    beds = {k: str(allelic_dir / f"cell_Valid_{k}.bed")
            for k in ("Bi_Allelic", "M_M", "P_P", "M_P", "P_M")}
    lines = {k: sum(1 for _ in open(p)) for k, p in beds.items()}
    tags = {}
    for k in ("M_M", "P_P"):
        tags[k] = Counter(l.split()[-1] for l in open(beds[k]))

    assert rep["Total_valid_pairs"] == n_both + 2 * n_spec
    assert rep["Total_valid_pairs"] == sum(lines.values())
    assert rep["Bi_Allelic_pairs"] == lines["Bi_Allelic"]
    assert rep["Maternal_Allelic_pairs"] == lines["M_M"]
    assert rep["Paternal_Allelic_pairs"] == lines["P_P"]
    assert rep["Recombination_pairs"] == lines["M_P"] + lines["P_M"]
    assert rep["Maternal_both_sides_pairs"] == tags["M_M"]["Both"]
    assert rep["Paternal_both_sides_pairs"] == tags["P_P"]["Both"]
    assert rep["Maternal_single_side_pairs"] == (tags["M_M"]["R1"]
                                                 + tags["M_M"]["R2"])
    assert rep["Paternal_single_side_pairs"] == (tags["P_P"]["R1"]
                                                 + tags["P_P"]["R2"])
    assert rep["Speci_Maternal_Mapping_pairs"] == n_spec
    assert rep["Speci_Paternal_Mapping_pairs"] == n_spec
    # specific sub-splits follow the SNP combos: ~1/4 each of Both/R1/R2/N
    for side in ("Maternal", "Paternal"):
        both = rep[f"Speci_{side}_both_sides_pairs"]
        single = rep[f"Speci_{side}_single_sides_pairs"]
        assert abs(both - n_spec / 4) < n_spec * 0.05
        assert abs(single - n_spec / 2) < n_spec * 0.05
    assert rep["Allelic_Ratio"] == pytest.approx(
        (lines["M_M"] + lines["P_P"]) / rep["Total_valid_pairs"])
    # every rule class fired at volume
    assert min(lines.values()) > 100

    # ---- matrix totals vs a direct recount of the beds ------------------
    genome_size = tmp_path / "genomeSize"
    Genome(CHROMS).write(str(genome_size))
    whole_res, local_res = 200_000, 100_000
    out = haplotype_matrix_construction(
        str(tmp_path / "Matrix"), [str(allelic_dir)], str(genome_size),
        whole_res=[whole_res], local_res=[local_res],
        imputation_region=1_000_000)
    files = next(iter(out.values()))

    r = CoolerReader(files["unimputated"], local_res)
    for hap, key in (("M", "M_M"), ("P", "P_P")):
        rows = _bed_contacts(beds[key], tagged=True)
        for c in LABELS:
            want = 0
            for c1, p1, c2, p2, tag in rows:
                if tag == "Both" and c1 == c and c2 == c:
                    b1, b2 = p1 // local_res, p2 // local_res
                    want += 2 - (b1 == b2)
            got = r.matrix(hap + c).sum()
            assert got == want, (hap, c, got, want)

    # genome-wide unimputated cross blocks carry M_P + P_M contacts: each
    # contact lands once in its block and once in the transpose block, so
    # block (M a, P b) totals M_P(a→b) + P_M(b→a)
    rw = CoolerReader(files["unimputated"], whole_res)
    mp = Counter()
    for c1, p1, c2, p2, _ in _bed_contacts(beds["M_P"], tagged=False):
        mp[(c1, c2)] += 1
    pm = Counter()
    for c1, p1, c2, p2, _ in _bed_contacts(beds["P_M"], tagged=False):
        pm[(c1, c2)] += 1
    for a in LABELS:
        for b in LABELS:
            got_cnt = rw.matrix_between("M" + a, "P" + b).sum()
            assert got_cnt == mp[(a, b)] + pm[(b, a)], (a, b)
