"""Built-in enzyme table invariants + resolution tiers.

Every table entry must be a palindromic site (its own reverse complement)
with a within-site cut — exactly the geometry whose Hi-C ligation junction
is well-defined — and the derived junction must itself be palindromic.
Known junctions for the classic Hi-C enzymes are pinned explicitly
(HiCHap/fastqPlus.py:18-64 semantics).
"""

import pytest

from hichap_master_tpu.pipeline.enzyme import (ENZYME_DB, enzyme_handle,
                                               junction_info)

_COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def _revcomp(s):
    return "".join(_COMP[b] for b in reversed(s))


def test_all_entries_palindromic_within_site():
    assert len(ENZYME_DB) >= 60
    for name, (site, fst5, fst3) in ENZYME_DB.items():
        assert set(site) <= set("ACGT"), name
        assert site == _revcomp(site), f"{name}: site not palindromic"
        assert 0 <= fst5 <= len(site), name
        assert fst3 == -fst5, name
        jp, jm, pal = junction_info(site, (fst5, fst3))
        assert pal, f"{name}: junction not palindromic"
        assert jp == _revcomp(jp), name


@pytest.mark.parametrize("name,junction", [
    ("MboI", "GATCGATC"),          # ^GATC -> blunt-fill 4-cutter
    ("DpnII", "GATCGATC"),
    ("HindIII", "AAGCTAGCTT"),     # A^AGCTT
    ("NcoI", "CCATGCATGG"),        # C^CATGG
    ("BglII", "AGATCGATCT"),       # A^GATCT
    ("EcoRI", "GAATTAATTC"),       # G^AATTC
    # CATG^ (3' overhang): the reference's GetJuncSeqInfo degenerates to
    # an EMPTY junction for overhangs past the midpoint
    # (fastqPlus.py:52-53, site[:-4] + site[4:]) — quirk parity
    ("NlaIII", ""),
    ("AluI", "AGCT"),              # AG^CT blunt: no duplicated core
])
def test_known_hic_junctions(name, junction):
    site, cut = enzyme_handle(name)
    jp, jm, pal = junction_info(site, cut)
    assert jp == junction
    assert pal


def test_custom_syntax_still_wins_dash():
    site, cut = enzyme_handle("A-AGCTT")
    assert site == "AAGCTT" and cut == (1, -1)


def test_unknown_name_mentions_biopython():
    with pytest.raises(ValueError, match="Bio.Restriction"):
        enzyme_handle("NoSuchEnzymeXYZ")


def test_biopython_adapter_when_available():
    pytest.importorskip("Bio.Restriction")
    # any name the builtin table lacks resolves through Biopython
    site, cut = enzyme_handle("EcoRI")
    assert site == "GAATTC"
