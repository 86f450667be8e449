"""Restriction-enzyme handling: site lookup, custom syntax, junction sequences.

The reference resolves enzymes through Bio.Restriction and falls back to a
custom ``A-AGCTT`` syntax (HiCHap/fastqPlus.py:18-64).  Biopython is not a
dependency here, so common Hi-C enzymes ship as a built-in table storing
``(site, fst5, fst3)`` — the same values ``Bio.Restriction.<E>.site`` and
``.charac[:2]`` provide.  Junction construction (``GetJuncSeqInfo``) is
reproduced exactly:

    jplus  = site[:fst3 or None] + site[fst5:]
    jminus = reverse-complement analog, reversed

with the palindromy flag deciding whether the minus junction needs its own
search pass.
"""

from __future__ import annotations

from typing import Tuple

# name -> (site, fst5, fst3); fst5 = cut offset on the 5' strand from the
# site start, fst3 = cut offset from the site end (negative).
ENZYME_DB = {
    "MboI": ("GATC", 0, 0),
    "DpnII": ("GATC", 0, 0),
    "Sau3AI": ("GATC", 0, 0),
    "HindIII": ("AAGCTT", 1, -1),
    "EcoRI": ("GAATTC", 1, -1),
    "BamHI": ("GGATCC", 1, -1),
    "BglII": ("AGATCT", 1, -1),
    "NcoI": ("CCATGG", 1, -1),
    "MseI": ("TTAA", 1, -1),
    "Csp6I": ("GTAC", 1, -1),
    "NlaIII": ("CATG", 4, -4),
    "HaeIII": ("GGCC", 2, -2),
    "AluI": ("AGCT", 2, -2),
}

_LEGAL = set("A-GCT")
_COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def enzyme_handle(enzyme: str) -> Tuple[str, Tuple[int, int]]:
    """Resolve an enzyme name or custom ``A-AGCTT`` spec → (site, cutsite)."""
    if enzyme in ENZYME_DB:
        site, fst5, fst3 = ENZYME_DB[enzyme]
        return site, (fst5, fst3)
    for ch in enzyme:
        if ch not in _LEGAL:
            raise ValueError(f"Illegal character {ch!r} in enzyme {enzyme!r}")
    if enzyme.count("-") != 1:
        raise ValueError(
            f"Enzyme spec {enzyme!r} needs exactly ONE '-' cut mark "
            "(e.g. A-AGCTT)")
    site = "".join(enzyme.split("-"))
    cut = enzyme.index("-")
    return site, (cut, -cut)


def junction_info(site: str, cutsite: Tuple[int, int]) -> Tuple[str, str, bool]:
    """(junction_plus, junction_minus, palindromic) — fastqPlus.py:45-64."""
    rev = "".join(_COMP[b] for b in site)
    if cutsite[-1]:
        jplus = site[: cutsite[-1]] + site[cutsite[0]:]
        jminus = rev[: cutsite[-1]] + rev[cutsite[0]:]
    else:
        jplus = site + site[cutsite[0]:]
        jminus = rev + rev[cutsite[0]:]
    jminus = jminus[::-1]
    return jplus, jminus, jplus == jminus
