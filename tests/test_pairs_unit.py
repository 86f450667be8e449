"""Pair-resolution case tree: unit coverage of the 2/3/4/6-read branches."""

import numpy as np
import pytest

from hichap_master_tpu.io.sam import AlnRecord
from hichap_master_tpu.pipeline.pairs import (
    MULTI,
    UNMAPPED,
    PairResolver,
    frag_mid,
    is_unique_read,
    iter_groups,
    load_fragments,
    snps_match,
)


def rec(name, ref="1", pos=100, flag=0, seq="A" * 50, tag_as=0, tag_xs=None,
        unmapped=False):
    return AlnRecord(name, 4 if unmapped else flag,
                     None if unmapped else ref, pos, 42, seq, "I" * len(seq),
                     tag_as=None if unmapped else tag_as, tag_xs=tag_xs)


@pytest.fixture
def frags(tmp_path):
    # chrom 1: fragments [1,1000) [1000,2000) [2000,3000); chrom 2: [1,5000)
    p = tmp_path / "frags.txt"
    p.write_text("1\t1\t1000\n1\t1000\t2000\n1\t2000\t3000\n2\t1\t5000\n")
    return load_fragments(str(p))


def test_frag_mid(frags):
    assert frag_mid(frags, rec("x_1", pos=99)) == (1 + 1000) // 2
    assert frag_mid(frags, rec("x_1", pos=1500)) == (1000 + 2000) // 2
    # position 1 exactly: clamped to the first fragment (D9)
    assert frag_mid(frags, rec("x_1", pos=0)) == (1 + 1000) // 2


def test_uniqueness_levels():
    unique = rec("a_1")
    multi = rec("a_1", tag_xs=0)
    better = rec("a_1", tag_as=-2, tag_xs=-10)
    assert is_unique_read(unique, 1)
    assert not is_unique_read(multi, 1)
    assert not is_unique_read(better, 1)   # level 1: any XS disqualifies
    assert is_unique_read(better, 2)       # level 2: AS > XS rescues


def test_snps_match():
    snps = {"1": {
        "pos": np.array([105, 110, 200]),
        "m_alt": np.array(["G", "T", "A"]),
        "p_alt": np.array(["C", "C", "C"]),
    }}
    seq = "A" * 4 + "G" + "A" * 4 + "T" + "A" * 40  # pos 105->G, 110->T
    r = rec("x_1", pos=100, seq=seq)  # 1-based start 101
    assert snps_match(r, snps, "Maternal") == 2
    assert snps_match(r, snps, "Paternal") == 0


def test_two_read_cases(frags):
    rv = PairResolver(frags)
    info = rv.resolve([rec("p_1", pos=100), rec("p_2", ref="2", pos=50,
                                                flag=16)])
    assert info[0] == "p"
    assert info[1] == "1" and info[8] == "2"
    assert int(info[6]) == 500 and int(info[13]) == 2500
    assert rv.resolve([rec("p_1", unmapped=True), rec("p_2")]) == UNMAPPED
    assert rv.resolve([rec("p_1", tag_xs=0), rec("p_2")]) == MULTI
    # scaffold reference counts as unmapped
    assert rv.resolve([rec("p_1", ref="scaffold_12"), rec("p_2")]) == UNMAPPED


def test_three_read_case_skips_unmapped_duplicate_tag(frags):
    rv = PairResolver(frags)
    group = [rec("p_1", pos=100), rec("p_2", unmapped=True),
             rec("p_2", pos=2500, seq="A" * 30)]
    info = rv.resolve(group)
    assert info[0] == "p" and int(info[13]) == 2500


def test_r1_split_candidate_r2(frags):
    """F(sub2) == F(whole) → candidate marked R2 (bamProcess.py:285-287)."""
    rv = PairResolver(frags)
    group = [rec("p_1", pos=100, seq="A" * 150, unmapped=True),
             rec("p_11", pos=150, seq="A" * 20),
             rec("p_12", pos=2100, seq="A" * 20),
             rec("p_2", pos=2200, flag=16)]
    info = rv.resolve(group)
    assert len(info) == 23
    assert info[22] == "R2"
    assert int(info[20]) == 2500  # candidate fragment == whole's fragment


def test_r1_split_candidate_r1(frags):
    """F(sub1) == F(sub2) → candidate marked R1 (bamProcess.py:288-290)."""
    rv = PairResolver(frags)
    group = [rec("p_1", pos=100, seq="A" * 150, unmapped=True),
             rec("p_11", pos=150, seq="A" * 20),
             rec("p_12", pos=300, seq="A" * 20),
             rec("p_2", pos=2200, flag=16)]
    info = rv.resolve(group)
    assert info[22] == "R1"


def test_r1_split_two_interactions(frags):
    """Different fragments everywhere → two bed rows with _1/_2 names."""
    rv = PairResolver(frags)
    group = [rec("p_1", pos=100, seq="A" * 150, unmapped=True),
             rec("p_11", pos=150, seq="A" * 20),
             rec("p_12", pos=1500, seq="A" * 20),
             rec("p_2", pos=2500, flag=16)]
    out = rv.resolve(group)
    assert isinstance(out, tuple)
    a, b = out
    assert a[0] == "p_1" and b[0] == "p_2"


def test_six_read_both_split(frags):
    rv = PairResolver(frags)
    group = [rec("p_11", pos=100, seq="A" * 20),
             rec("p_12", pos=200, seq="A" * 20),
             rec("p_21", pos=2100, seq="A" * 20),
             rec("p_22", pos=2200, seq="A" * 20)] + [
        rec("p_1", unmapped=True, seq="A" * 150),
        rec("p_2", unmapped=True, seq="A" * 150)]
    # order by tag multiset is what matters; group size 6
    out = rv.resolve(group)
    # F11==F12 (same fragment) and F21==F22 → merged candidate interactions
    assert out is not UNMAPPED and out is not MULTI


def test_iter_groups():
    recs = [rec("a_1"), rec("a_2"), rec("b_1"), rec("b_2"), rec("b_21")]
    groups = list(iter_groups(recs))
    assert [len(g) for g in groups] == [2, 3]


def test_snps_match_reference_pickle_bytes(tmp_path):
    """The reference's py2 Snps.pickle stores 'S1' BYTES alleles; a str
    read base never equals b'G', so every SNP count was silently zero in
    allelic mode (round-3 review find) — load_snps must decode."""
    import pickle

    from hichap_master_tpu.io.fasta import load_snps

    raw = {"1": {
        "pos": np.array([105, 110, 200]),
        "m_alt": np.array([b"G", b"T", b"A"], dtype="S1"),
        "p_alt": np.array([b"C", b"C", b"C"], dtype="S1"),
    }}
    p = tmp_path / "Snps.pickle"
    with open(p, "wb") as f:
        pickle.dump(raw, f, protocol=2)
    snps = load_snps(str(p))
    seq = "A" * 4 + "G" + "A" * 4 + "T" + "A" * 40
    r = rec("x_1", pos=100, seq=seq)
    assert snps_match(r, snps, "Maternal") == 2
    assert snps_match(r, snps, "Paternal") == 0
