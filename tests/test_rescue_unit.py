"""Junction-split rescue modes (fastqPlus.py:67-138 semantics)."""

from hichap_master_tpu.pipeline.enzyme import enzyme_handle, junction_info
from hichap_master_tpu.pipeline.rescue import MIN_LEN, split_read

JUNC_MBOI = junction_info(*enzyme_handle("MboI"))     # GATCGATC, palindromic
JUNC_ASYM = junction_info(*enzyme_handle("AC-GGT"))   # non-palindromic


def _fq(txt):
    lines = txt.strip().split("\n")
    return [(lines[i][1:], lines[i + 1]) for i in range(0, len(lines), 4)]


def test_no_site_dropped():
    assert split_read("r", "A" * 40, "I" * 40, JUNC_MBOI) == ""


def test_two_sites_confused_dropped():
    j = JUNC_MBOI[0]
    seq = "A" * 12 + j + "C" * 12 + j + "G" * 12
    assert split_read("r", seq, "I" * len(seq), JUNC_MBOI) == ""


def test_one_site_both_flanks_survive():
    j = JUNC_MBOI[0]
    seq = "A" * 15 + j + "C" * 20
    out = _fq(split_read("r", seq, "I" * len(seq), JUNC_MBOI))
    assert out == [("r1", "A" * 15), ("r2", "C" * 20)]


def test_short_left_flank_keeps_right_only():
    j = JUNC_MBOI[0]
    seq = "A" * (MIN_LEN - 1) + j + "C" * 25
    out = _fq(split_read("r", seq, "I" * len(seq), JUNC_MBOI))
    assert out == [("r", "C" * 25)]  # original name, no suffix


def test_short_right_flank_keeps_left_only():
    j = JUNC_MBOI[0]
    seq = "A" * 25 + j + "C" * (MIN_LEN - 1)
    out = _fq(split_read("r", seq, "I" * len(seq), JUNC_MBOI))
    assert out == [("r", "A" * 25)]


def test_both_flanks_short_dropped():
    j = JUNC_MBOI[0]
    seq = "A" * 5 + j + "C" * 5
    assert split_read("r", seq, "I" * len(seq), JUNC_MBOI) == ""


def test_minus_strand_search_only_when_plus_empty():
    jplus, jminus, pal = JUNC_ASYM
    assert not pal and jplus != jminus
    seq = "G" * 15 + jminus + "C" * 20
    out = _fq(split_read("r", seq, "I" * len(seq), JUNC_ASYM))
    assert out == [("r1", "G" * 15), ("r2", "C" * 20)]
    # a plus-strand site shadows any minus-strand sites (plus found → minus
    # never searched, so a plus+minus read is a single-site split, not
    # "confused")
    seq2 = "G" * 12 + jplus + "C" * 12 + jminus + "T" * 12
    out2 = split_read("r", seq2, "I" * len(seq2), JUNC_ASYM)
    assert out2 != ""
    names = [n for n, _ in _fq(out2)]
    assert names == ["r1", "r2"]


def test_quality_follows_flanks():
    j = JUNC_MBOI[0]
    seq = "A" * 12 + j + "C" * 12
    qual = "L" * 12 + "J" * len(j) + "R" * 12
    txt = split_read("r", seq, qual, JUNC_MBOI)
    lines = txt.strip().split("\n")
    assert lines[3] == "L" * 12 and lines[7] == "R" * 12
