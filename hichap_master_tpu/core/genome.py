"""Chromosome registry, bin maps and genome-size handling.

Re-specifies the reference's genome bookkeeping (HiCHap/matrixBuilding.py:349-454
``Load_Genome`` / ``Sort_Chromosomes`` / ``Get_Chro_Bins`` /
``Get_Chro_Bins_Haplotypes``) as a single registry object usable both host-side
(I/O, cooler bins) and as static metadata for jitted kernels.

Conventions (matching the reference):
  * chromosome labels are stored without the ``chr`` prefix;
  * a chroms filter list like ``['#', 'X']`` selects all numeric chromosomes
    plus X (``'#'`` means "any purely numeric label"); an empty list selects all;
  * matrix binning uses ``n_bins = length // res + 1``
    (HiCHap/matrixBuilding.py:416-426), while cooler bin tables use
    ``ceil(length / res)`` (cooler's ``binnify``; matrixBuilding.py:230-241).
    The trailing matrix bin is provably empty whenever the conventions differ,
    so matrices are trimmed to the cooler bin count on persistence.
  * haplotype (diploid) mode duplicates every chromosome as ``M<label>`` and
    ``P<label>``, all maternal chromosomes first (matrixBuilding.py:439-443).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Mapping, Sequence, Tuple

import numpy as np

DEFAULT_CHROMS = ("#", "X")


def strip_chr(label: str) -> str:
    """Remove a leading ``chr`` prefix (reference: ``lstrip('chr')`` semantics).

    The reference uses str.lstrip which strips *characters*, not the prefix;
    for real chromosome names (``chr1``, ``chrX``) the two agree.  We use
    proper prefix removal to avoid mangling names like ``chr_random``.
    """
    return label[3:] if label.startswith("chr") else label


def chrom_check(label: str, chroms: Sequence[str]) -> bool:
    """Membership test with the reference's ``'#'`` = "numeric" convention
    (HiCHap/matrixBuilding.py:360)."""
    c = strip_chr(label)
    if not chroms:
        return True
    return (c.isdigit() and "#" in chroms) or (c in chroms)


def sort_chromosomes(labels: Iterable[str]) -> List[str]:
    """Numeric labels sorted numerically first, then string labels sorted
    lexically (HiCHap/matrixBuilding.py:388-406).

    Labels are returned VERBATIM (stripped of ``chr`` only): the old
    int() round trip rewrote '01' to '1' (KeyError against the registry)
    and parsed '1_1' as 11 (silently dropping the scaffold and
    double-counting chr11's bins)."""
    nums: List[str] = []
    strs: List[str] = []
    for raw in labels:
        c = strip_chr(raw)
        if c.isdigit():
            nums.append(c)
        else:
            strs.append(c)
    return sorted(nums, key=int) + sorted(strs)


class Genome:
    """Ordered chromosome → length registry with bin arithmetic."""

    def __init__(self, sizes: Mapping[str, int], chroms: Sequence[str] = DEFAULT_CHROMS):
        filtered = {
            strip_chr(c): int(l) for c, l in sizes.items() if chrom_check(c, chroms)
        }
        self.labels: List[str] = sort_chromosomes(filtered.keys())
        self.sizes: Dict[str, int] = {c: filtered[c] for c in self.labels}
        self.chrom_filter = tuple(chroms)

    # ------------------------------------------------------------------ io
    @classmethod
    def from_file(cls, genome_size_path: str | os.PathLike,
                  chroms: Sequence[str] = DEFAULT_CHROMS) -> "Genome":
        sizes: Dict[str, int] = {}
        with open(genome_size_path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    sizes[parts[0]] = int(parts[1])
        return cls(sizes, chroms)

    def write(self, path: str | os.PathLike) -> None:
        with open(path, "w") as f:
            for c in self.labels:
                f.write(f"{c}\t{self.sizes[c]}\n")

    # ----------------------------------------------------------- variants
    def haplotype(self) -> "Genome":
        """Diploid registry ``M1..Mn, P1..Pn`` (matrixBuilding.py:369-386)."""
        g = Genome.__new__(Genome)
        g.labels = [f"M{c}" for c in self.labels] + [f"P{c}" for c in self.labels]
        g.sizes = {f"{h}{c}": self.sizes[c] for h in "MP" for c in self.labels}
        g.chrom_filter = self.chrom_filter
        return g

    # ---------------------------------------------------------------- bins
    def n_bins(self, label: str, res: int) -> int:
        """Matrix bin count: ``length // res + 1`` (matrixBuilding.py:564)."""
        return self.sizes[label] // res + 1

    def cooler_n_bins(self, label: str, res: int) -> int:
        """Cooler bin-table count: ``ceil(length / res)``."""
        return -(-self.sizes[label] // res)

    def bin_offsets(self, res: int) -> Dict[str, Tuple[int, int]]:
        """Genome-wide (start, end) inclusive bin ranges per chromosome in
        sorted order, matching ``Get_Chro_Bins`` (matrixBuilding.py:409-426)."""
        out: Dict[str, Tuple[int, int]] = {}
        start = 0
        for c in self.labels:
            nb = self.n_bins(c, res)
            out[c] = (start, start + nb - 1)
            start += nb
        return out

    def total_bins(self, res: int) -> int:
        return sum(self.n_bins(c, res) for c in self.labels)

    def cooler_bin_table(self, res: int):
        """(chrom_idx, start, end) arrays for the cooler ``bins`` group."""
        chrom_ids, starts, ends = [], [], []
        for ci, c in enumerate(self.labels):
            nb = self.cooler_n_bins(c, res)
            s = np.arange(nb, dtype=np.int64) * res
            e = np.minimum(s + res, self.sizes[c])
            chrom_ids.append(np.full(nb, ci, dtype=np.int32))
            starts.append(s)
            ends.append(e)
        return (
            np.concatenate(chrom_ids),
            np.concatenate(starts),
            np.concatenate(ends),
        )

    # -------------------------------------------------------------- dunder
    def __iter__(self):
        return iter(self.labels)

    def __len__(self):
        return len(self.labels)

    def __contains__(self, label: str) -> bool:
        return strip_chr(label) in self.sizes

    def __getitem__(self, label: str) -> int:
        return self.sizes[strip_chr(label)]

    def __repr__(self):
        return f"Genome({len(self.labels)} chroms: {', '.join(self.labels[:6])}...)"
