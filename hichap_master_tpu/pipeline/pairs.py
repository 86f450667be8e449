"""Alignment-pair resolution: the 2/3/4/5/6-read case tree.

Spec: HiCHap/bamProcess.py — ``Pair_Integrate`` (937-1453) and its
non-allelic twin (192-683), unified here into one resolver (the only
difference is whether per-read SNP matching runs).  Read groups arrive
name-sorted; the group's tag multiset (``_1/_2`` mate suffixes from
chunking, ``1/2`` sub-read suffixes from junction rescue) selects the case:

  {1,2}            plain pair
  {1,2,2}          one-flank rescue (unmapped original skipped)
  {1,11,12,2}      R1 split (candidate logic)
  {1,2,21,22}      R2 split
  {1,1,2,2}        both one-flank rescues (150 bp originals dropped)
  {1,11,12,2,2}    R1 split + R2 one-flank
  {1,1,2,21,22}    R1 one-flank + R2 split
  {11,12,21,22,..} both split (6 reads)

Outputs the 15/23-column bed record (bamProcess.py:696-723): per mate
(reference, strand-flag, 1-based pos, length, AS, fragment-mid, SNP count),
optionally a candidate mate + ``R1``/``R2`` marker.  The reference's
hard-coded 150 bp "uncut mate" sentinel (bamProcess.py:352, 388-391) is the
``read_len`` parameter.
"""

from __future__ import annotations

import bisect
from typing import Dict, Iterable, List, Optional, Sequence, Tuple, Union

import numpy as np

from ..core.genome import strip_chr
from ..io.sam import AlnRecord

Resolution = Union[int, str, List[str], Tuple[List[str], List[str]]]
UNMAPPED, MULTI = 0, 1


# ------------------------------------------------------------- utilities
def load_fragments(frag_path: str) -> Dict[str, np.ndarray]:
    """chrom → sorted cut array [1, end1, end2, ..., chrom_len]
    (bamProcess.py:19-42; only numeric/X/Y chromosomes kept)."""
    frags: Dict[str, List[int]] = {}
    with open(frag_path) as f:
        for line in f:
            p = line.split()
            c = strip_chr(p[0])
            if not (c.isdigit() or c in ("X", "Y")):
                continue
            frags.setdefault(c, [1]).append(int(p[2]))
    return {c: np.asarray(v, np.int64) for c, v in frags.items()}


def frag_mid(frags: Dict[str, np.ndarray], rec: AlnRecord) -> int:
    """Fragment midpoint for a mapped read (bamProcess.py:45-55).

    The reference's ``bisect_left`` wraps to the last element for reads at
    position 1 exactly; clamped here (DIVERGENCES.md)."""
    c = strip_chr(rec.reference_name)
    arr = frags[c]
    pos = rec.pos + 1
    idx = bisect.bisect_left(arr, pos)
    idx = max(idx, 1)
    idx = min(idx, len(arr) - 1)
    return int((arr[idx - 1] + arr[idx]) // 2)


def snps_match(rec: AlnRecord, snps: Optional[dict], allelic: str) -> int:
    """Count of read bases matching the haplotype's alt alleles
    (bamProcess.py:74-102; ungapped-alignment assumption preserved)."""
    if snps is None:
        return 0
    c = strip_chr(rec.reference_name)
    if c not in snps:
        return 0
    pos = rec.pos + 1
    tbl = snps[c]
    start = np.searchsorted(tbl["pos"], pos, side="left")
    end = np.searchsorted(tbl["pos"], pos + rec.query_length, side="left")
    if start == end:
        return 0
    alt_key = "m_alt" if allelic == "Maternal" else "p_alt"
    count = 0
    for p, alt in zip(tbl["pos"][start:end], tbl[alt_key][start:end]):
        off = int(p) - pos
        if 0 <= off < len(rec.seq) and rec.seq[off] == alt:
            count += 1
    return count


def is_unmapped_read(rec: AlnRecord) -> bool:
    """Scaffold hits count as unmapped (bamProcess.py:108-119)."""
    if rec.is_unmapped:
        return True
    c = strip_chr(rec.reference_name)
    return not (c.isdigit() or c in ("X", "Y"))


def is_unique_read(rec: AlnRecord, level: int = 1) -> bool:
    """Uniqueness by AS/XS tags at two strictness levels
    (bamProcess.py:122-142)."""
    if is_unmapped_read(rec) or not rec.has_tag("AS"):
        return False
    if level == 1:
        return not rec.has_tag("XS")
    if rec.has_tag("XS"):
        return rec.get_tag("AS") > rec.get_tag("XS")
    return True


# ------------------------------------------------------------ info rows
class PairResolver:
    def __init__(self, frags: Dict[str, np.ndarray],
                 snps: Optional[dict] = None, allelic: str = "",
                 level: int = 1, read_len: int = 150):
        self.frags = frags
        self.snps = snps
        self.allelic = allelic
        self.level = level
        self.read_len = read_len

    # -- row builders (bamProcess.py:889-933)
    def _mate_cols(self, rec: AlnRecord) -> List[str]:
        return [rec.reference_name, str(rec.flag), str(rec.pos + 1),
                str(rec.query_length), str(rec.get_tag("AS")),
                str(frag_mid(self.frags, rec)),
                str(snps_match(rec, self.snps, self.allelic))]

    def info2(self, m1: AlnRecord, m2: AlnRecord) -> List[str]:
        name = "_".join(m1.query_name.split("_")[:-1])
        return [name] + self._mate_cols(m1) + self._mate_cols(m2)

    def info3(self, m1: AlnRecord, m2: AlnRecord, cand: AlnRecord,
              mark: str) -> List[str]:
        return self.info2(m1, m2) + self._mate_cols(cand) + [mark]

    # -- candidate dedup (bamProcess.py:867-886)
    @staticmethod
    def merge_candidates(i1: List[str], i2: List[str]) -> Resolution:
        if i1[1] == i2[1] and i1[8] == i2[8] and \
                i1[6] == i2[6] and i1[13] == i2[13]:
            return i1
        i1 = list(i1)
        i2 = list(i2)
        i1[0] += "_1"
        i2[0] += "_2"
        return (i1, i2)

    # -- split-side sub-resolvers (shared by the 4/5/6-read cases).
    # The reference's R1-split and R2-split branches differ in both check
    # order and fallback row order; each is reproduced exactly.
    def _set_side(self, split_is_r1: bool):
        self._split_is_r1 = split_is_r1

    def _split_one_side(self, sub1: AlnRecord, sub2: AlnRecord,
                        whole: AlnRecord) -> Resolution:
        if self._split_is_r1:
            return self._split_r1(sub1, sub2, whole)
        return self._split_r2(sub1, sub2, whole)

    def _split_r1(self, m11, m12, m2) -> Resolution:
        """R1 split: flanks (m11, m12), whole mate m2
        (bamProcess.py:269-296)."""
        if not is_unique_read(m11, self.level):
            if frag_mid(self.frags, m12) == frag_mid(self.frags, m2):
                return UNMAPPED
            return self.info2(m12, m2)
        if not is_unique_read(m12, self.level):
            return self.info2(m11, m2)
        f11 = frag_mid(self.frags, m11)
        f12 = frag_mid(self.frags, m12)
        f2 = frag_mid(self.frags, m2)
        if f12 == f2:
            return self.info3(m11, m2, m12, "R2")
        if f11 == f12:
            return self.info3(m11, m2, m12, "R1")
        return self.merge_candidates(self.info2(m11, m12),
                                     self.info2(m12, m2))

    def _split_r2(self, m21, m22, m1) -> Resolution:
        """R2 split: flanks (m21, m22), whole mate m1
        (bamProcess.py:318-347)."""
        if not is_unique_read(m21, self.level):
            if frag_mid(self.frags, m22) == frag_mid(self.frags, m1):
                return UNMAPPED
            return self.info2(m1, m22)
        if not is_unique_read(m22, self.level):
            return self.info2(m1, m21)
        f21 = frag_mid(self.frags, m21)
        f22 = frag_mid(self.frags, m22)
        f1 = frag_mid(self.frags, m1)
        if f21 == f22:
            return self.info3(m1, m21, m22, "R2")
        if f22 == f1:
            return self.info3(m1, m21, m22, "R1")
        return self.merge_candidates(self.info2(m1, m22),
                                     self.info2(m22, m21))

    # ------------------------------------------------------------ resolve
    def resolve(self, group: Sequence[AlnRecord]) -> Resolution:
        tags = sorted(r.query_name.split("_")[-1] for r in group)
        by_tag: Dict[str, List[AlnRecord]] = {}
        for r in group:
            by_tag.setdefault(r.query_name.split("_")[-1], []).append(r)

        n = len(group)
        if n == 2:
            for r in group:
                if is_unmapped_read(r):
                    return UNMAPPED
                if not is_unique_read(r, self.level):
                    return MULTI
            return self.info2(group[0], group[1])

        if n == 3:
            if sum(is_unmapped_read(r) for r in group) >= 2:
                return UNMAPPED
            if sum(not is_unique_read(r, self.level) for r in group) >= 2:
                return MULTI
            m1 = m2 = None
            for r in group:
                if is_unmapped_read(r):
                    continue
                if r.query_name[-1] == "1":
                    m1 = r
                elif r.query_name[-1] == "2":
                    m2 = r
            if m1 is None or m2 is None:
                return UNMAPPED
            return self.info2(m1, m2)

        if n == 4:
            if tags == ["1", "11", "12", "2"]:
                m11, m12 = by_tag["11"][0], by_tag["12"][0]
                m2 = by_tag["2"][0]
                return self._four_plus(m11, m12, m2, split_is_r1=True)
            if tags == ["1", "2", "21", "22"]:
                m21, m22 = by_tag["21"][0], by_tag["22"][0]
                m1 = by_tag["1"][0]
                return self._four_plus(m21, m22, m1, split_is_r1=False)
            if tags == ["1", "1", "2", "2"]:
                new = [r for r in group if r.query_length != self.read_len]
                for r in new:
                    if is_unmapped_read(r):
                        return UNMAPPED
                    if not is_unique_read(r, self.level):
                        return MULTI
                if len(new) < 2:
                    return UNMAPPED
                return self.info2(new[0], new[1])
            return ""

        if n == 5:
            if tags == ["1", "11", "12", "2", "2"]:
                m2 = next((r for r in by_tag["2"]
                           if r.query_length < self.read_len), None)
                if m2 is None:
                    return UNMAPPED
                return self._four_plus(by_tag["11"][0], by_tag["12"][0], m2,
                                       split_is_r1=True)
            if tags == ["1", "1", "2", "21", "22"]:
                m1 = next((r for r in by_tag["1"]
                           if r.query_length < self.read_len), None)
                if m1 is None:
                    return UNMAPPED
                return self._four_plus(by_tag["21"][0], by_tag["22"][0], m1,
                                       split_is_r1=False)
            return ""

        if n == 6:
            need = ("11", "12", "21", "22")
            if not all(t in by_tag for t in need):
                return ""
            m11, m12 = by_tag["11"][0], by_tag["12"][0]
            m21, m22 = by_tag["21"][0], by_tag["22"][0]
            return self._six(m11, m12, m21, m22)

        return ""

    def _four_plus(self, sub1, sub2, whole, split_is_r1: bool) -> Resolution:
        """Shared 4/5-read logic (bamProcess.py:249-347, 383-491)."""
        if is_unmapped_read(whole):
            return UNMAPPED
        if is_unmapped_read(sub1) and is_unmapped_read(sub2):
            return UNMAPPED
        if not is_unique_read(whole, self.level):
            return MULTI
        if (not is_unique_read(sub1, self.level)
                and not is_unique_read(sub2, self.level)):
            return MULTI
        self._set_side(split_is_r1)
        return self._split_one_side(sub1, sub2, whole)

    def _six(self, m11, m12, m21, m22) -> Resolution:
        """Both mates split (bamProcess.py:493-678)."""
        if is_unmapped_read(m11) and is_unmapped_read(m12):
            return UNMAPPED
        if is_unmapped_read(m21) and is_unmapped_read(m22):
            return UNMAPPED
        if (not is_unique_read(m11, self.level)
                and not is_unique_read(m12, self.level)):
            return MULTI
        if (not is_unique_read(m21, self.level)
                and not is_unique_read(m22, self.level)):
            return MULTI

        u11 = is_unique_read(m11, self.level)
        u12 = is_unique_read(m12, self.level)
        u21 = is_unique_read(m21, self.level)
        u22 = is_unique_read(m22, self.level)

        # When one flank of a side is non-unique, the side collapses to the
        # other flank and the remaining split side drives the candidate case.
        if not u11 or not u12:
            mate1 = m12 if not u11 else m11
            self._set_side(False)  # R2 is the (possibly) split side
            if not u22:
                return self.info2(mate1, m21)
            if not u21:
                return self.info2(mate1, m22)
            return self._split_one_side(m21, m22, mate1)
        if not u22 or not u21:
            mate2 = m21 if not u22 else m22
            self._set_side(True)  # R1 is the split side
            return self._split_one_side(m11, m12, mate2)

        # all four unique (bamProcess.py:630-678)
        f11 = frag_mid(self.frags, m11)
        f12 = frag_mid(self.frags, m12)
        f21 = frag_mid(self.frags, m21)
        f22 = frag_mid(self.frags, m22)
        if f11 == f12:
            if f22 == f21:
                i1 = self.info3(m11, m21, m22, "R2")
                i2 = self.info3(m12, m21, m22, "R2")
                return self.merge_candidates(i1, i2)
            i1 = self.info3(m11, m22, m12, "R1")
            i2 = self.info3(m12, m21, m12, "R1")
            return self.merge_candidates(i1, i2)
        if f22 == f21:
            i1 = self.info3(m11, m21, m22, "R2")
            i2 = self.info3(m12, m21, m22, "R2")
            return self.merge_candidates(i1, i2)
        if f12 == f22:
            i1 = self.info3(m11, m22, m12, "R2")
            i2 = self.info3(m12, m21, m22, "R1")
            return self.merge_candidates(i1, i2)
        i1 = self.info2(m11, m12)
        i2 = self.info2(m22, m21)
        return self.merge_candidates(i1, i2)


def iter_groups(records: Iterable[AlnRecord]):
    """Group a name-sorted record stream by base pair name
    (bamProcess.py:743-768)."""
    tag = None
    buf: List[AlnRecord] = []
    for rec in records:
        base = "_".join(rec.query_name.split("_")[:-1])
        if base != tag:
            if buf:
                yield buf
            buf = [rec]
            tag = base
        else:
            buf.append(rec)
    if buf:
        yield buf
