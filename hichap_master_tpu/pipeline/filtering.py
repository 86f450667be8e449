"""Hi-C noise filtering and maternal/paternal allelic assignment.

Spec: HiCHap/filtering.py.

``hic_filtering`` (cFiltering parity, filtering.py:126-432): sort all chunk
bed records by (chr1, strand1, pos1, chr2, strand2, pos2), drop consecutive
duplicates, classify self-circle / dangling-end / unknown-mechanism pairs on
the same fragment and extra-dangling-ends (≤500 bp, facing) across
fragments, write ``*_Valid.bed`` + a stats block.  Sorting and
classification are vectorized numpy (lexsort + boolean algebra) instead of
the reference's external merge sort; duplicates compare the six key fields
directly rather than the reference's collision-prone ASCII-sum pair ID
(filtering.py:146-158; see DIVERGENCES.md).

``allelic_filtering`` (aFiltering parity, filtering.py:437-1291): name-sort
the maternal and paternal valid beds, merge-join on pair name, and assign
each pair to Bi_Allelic / M_M / P_P / M_P / P_M with the reference's
per-mate rules (same position ±5 → SNP-count dominance; different position
→ AS-score gap ≥ MAX_DIFF_SCORE plus SNP dominance), candidate-mate
fallback included, emitting the 16-entry statistics dictionary.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from ..utils.logging import get_logger

log = get_logger(__name__)

MAX_DIFF_SCORE = 18  # filtering.py:447


# --------------------------------------------------------- HiC filtering
def _classify_block(lines: List[str], prev_key, stats: Dict[str, int],
                    out) -> tuple:
    """Vectorized dedup + SC/DE/UM/ED classification of one sorted block
    (filtering.py:273-354 semantics).  ``prev_key`` is the 6-field key of
    the previous block's last record (dedup across block boundaries);
    returns this block's last key.

    Columns parse through the pandas C reader (same ragged-width sniff as
    the valid-bed fallback reader) — the per-line ``split`` + ``int``
    loop this replaces was ~70% of the measured 20M-record stage wall."""
    import io as _io

    import pandas as pd

    def _parse(width):
        return pd.read_csv(
            _io.StringIO("".join(lines)), sep="\t", header=None,
            names=list(range(width)), usecols=[1, 2, 3, 6, 8, 9, 10, 13],
            dtype={1: object, 2: np.int32, 3: np.int64, 6: np.int64,
                   8: object, 9: np.int32, 10: np.int64, 13: np.int64},
            engine="c")

    width = max(15, lines[0].count("\t") + 1)
    try:
        df = _parse(width)
    except pd.errors.ParserError:
        width = max(15, max(ln.count("\t") for ln in lines) + 1)
        df = _parse(width)
    c1 = df[1].to_numpy()
    s1 = df[2].to_numpy()
    p1 = df[3].to_numpy()
    c2 = df[8].to_numpy()
    s2 = df[9].to_numpy()
    p2 = df[10].to_numpy()
    f1 = df[6].to_numpy()
    f2 = df[13].to_numpy()

    n = len(lines)
    stats["Total"] += n
    first = np.ones(n, bool)
    if n > 1:
        same = ((c1[1:] == c1[:-1]) & (s1[1:] == s1[:-1]) & (p1[1:] == p1[:-1])
                & (c2[1:] == c2[:-1]) & (s2[1:] == s2[:-1])
                & (p2[1:] == p2[:-1]))
        first[1:] = ~same
    if prev_key is not None:
        first[0] = (str(c1[0]), int(s1[0]), int(p1[0]),
                    str(c2[0]), int(s2[0]), int(p2[0])) != prev_key
    stats["Duplicates"] += int((~first).sum())

    same_chrom = c1 == c2
    same_frag = same_chrom & (f1 == f2)
    fwd_rev = (s1 == 0) & (s2 == 16)
    rev_fwd = (s1 == 16) & (s2 == 0)
    lt = p1 < p2

    de = same_frag & ((lt & fwd_rev) | (~lt & rev_fwd))
    sc = same_frag & ((lt & rev_fwd) | (~lt & fwd_rev))
    um = same_frag & ~de & ~sc
    ed = (same_chrom & ~same_frag & (np.abs(p1 - p2) <= 500)
          & ((lt & fwd_rev) | (~lt & rev_fwd)))

    stats["SelfCircle"] += int((sc & first).sum())
    stats["DanglingEnds"] += int((de & first).sum())
    stats["UnknownMechanism"] += int((um & first).sum())
    stats["ExtraDanglingEnds"] += int((ed & first).sum())
    valid = first & ~sc & ~de & ~um & ~ed
    stats["Valid"] += int(valid.sum())
    out.writelines(ln for ln, v in zip(lines, valid) if v)
    return (str(c1[-1]), int(s1[-1]), int(p1[-1]),
            str(c2[-1]), int(s2[-1]), int(p2[-1]))


def hic_filtering(bed_dir: str, out_dir: str, allelic: str = "NonAllelic",
                  clean: bool = True,
                  block_lines: Optional[int] = None) -> Dict[str, int]:
    """Duplicate removal + SC/DE/UM/ED classification → ``*_Valid.bed``.

    Bounded-memory streaming: each chunk bed is externally sorted by the
    (chr1, strand1, pos1, chr2, strand2, pos2) key (native hicio sort,
    which spills to disk past its threshold), the sorted runs are k-way
    merged, and classification streams the merged order in blocks of
    ``block_lines`` records with the dedup key carried across block
    boundaries — the reference's external-sort design
    (filtering.py:77-121, 223-267) without its per-line Python loop.
    """
    from ..io.native import merge_sorted, sort_file

    block_lines = block_lines or int(
        os.environ.get("HICHAP_FILTER_BLOCK", 1_000_000))
    os.makedirs(out_dir, exist_ok=True)
    if allelic != "NonAllelic":
        files = [f for f in sorted(os.listdir(bed_dir))
                 if allelic in f and "chunk" in f and f.endswith(".bed")]
    else:
        files = [f for f in sorted(os.listdir(bed_dir))
                 if "chunk" in f and f.endswith(".bed")]
    if not files:
        raise FileNotFoundError(f"no chunk beds under {bed_dir}")
    prefix = files[0].split("chunk")[0]

    stats = dict(Total=0, Duplicates=0, Valid=0, SelfCircle=0,
                 DanglingEnds=0, UnknownMechanism=0, ExtraDanglingEnds=0)
    if allelic != "NonAllelic":
        out_bed = os.path.join(out_dir, f"{prefix}{allelic}_Valid.bed")
    else:
        out_bed = os.path.join(out_dir, f"{prefix}Valid.bed")

    sorted_paths = []
    for f in files:
        dst = os.path.join(out_dir, f + ".ksorted")
        sort_file(os.path.join(bed_dir, f), dst, "hic_key")
        sorted_paths.append(dst)
    merged = os.path.join(out_dir, f"{prefix}{allelic}.ksorted.merged")
    if len(sorted_paths) == 1:
        os.replace(sorted_paths[0], merged)
    else:
        merge_sorted(sorted_paths, merged, "hic_key")
        for p in sorted_paths:
            os.remove(p)

    import itertools

    prev_key = None
    with open(merged) as src, open(out_bed, "w") as out:
        while True:
            lines = list(itertools.islice(src, block_lines))
            if not lines:
                break
            prev_key = _classify_block(lines, prev_key, stats, out)
    os.remove(merged)

    log.log(21, "HiC filtering (%s): %s", allelic, stats)
    if clean:
        for f in files:
            os.remove(os.path.join(bed_dir, f))
    return stats


# ------------------------------------------------------ allelic assignment
def _sub_search(m_c, m_pos, m_score, m_snps, p_c, p_pos, p_score, p_snps):
    """Per-mate allelic decision (filtering.py:552-592)."""
    if m_c == p_c and abs(m_pos - p_pos) <= 5:
        if m_snps > 2 * p_snps:
            return "M"
        if 2 * m_snps < p_snps:
            return "P"
        return "N"
    if (m_score - p_score) >= MAX_DIFF_SCORE and m_snps >= 2 * p_snps:
        return "M"
    if (p_score - m_score) >= MAX_DIFF_SCORE and p_snps >= 2 * m_snps:
        return "P"
    return "N"


def _candidate_ok(info: List[str]) -> bool:
    """Candidate usability (filtering.py:507-546): candidate must share
    chromosome + fragment with the mate it extends."""
    cand = info[-1]
    if cand == "R1":
        return info[1] == info[15] and int(info[6]) == int(info[20])
    return info[8] == info[15] and int(info[13]) == int(info[20])


class _Mate:
    __slots__ = ("c", "pos", "frag", "score", "snps")

    def __init__(self, info, base):
        self.c = info[base]
        self.pos = int(info[base + 2])
        self.frag = int(info[base + 5])
        self.score = int(info[base + 4])
        self.snps = int(info[base + 6])


def _both_mapping(m_info: List[str], p_info: List[str]):
    """Pair present in both parental beds (filtering.py:599-881).
    Returns (mark1+mark2, bed columns)."""
    mm = [_Mate(m_info, 1), _Mate(m_info, 8)]
    pp = [_Mate(p_info, 1), _Mate(p_info, 8)]

    def search(i):
        return _sub_search(mm[i].c, mm[i].pos, mm[i].score, mm[i].snps,
                           pp[i].c, pp[i].pos, pp[i].score, pp[i].snps)

    def line(i, mark):
        src = mm[i] if mark in ("N", "M") else pp[i]
        return [src.c, src.frag]

    marks = [search(0), search(1)]
    lines = [line(0, marks[0]), line(1, marks[1])]

    def retry_with_candidate(i, info, mates):
        """Swap in the candidate columns for mate i and re-search
        (filtering.py:684-722 pattern)."""
        mates[i] = _Mate(info, 15)
        mk = search(i)
        if mk == "M":
            lines[i] = [mm[i].c, mm[i].frag]
            marks[i] = "M"
        elif mk == "P":
            lines[i] = [pp[i].c, pp[i].frag]
            marks[i] = "P"

    m_cand = len(m_info) > 15
    p_cand = len(p_info) > 15
    if m_cand and not p_cand:
        which = m_info[-1]
        if _candidate_ok(m_info):
            i = 0 if which == "R1" else 1
            if marks[i] == "N":
                retry_with_candidate(i, m_info, mm)
    elif p_cand and not m_cand:
        which = p_info[-1]
        if _candidate_ok(p_info):
            i = 0 if which == "R1" else 1
            if marks[i] == "N":
                retry_with_candidate(i, p_info, pp)
    elif m_cand and p_cand:
        which = m_info[-1]
        i = 0 if which == "R1" else 1
        if marks[i] == "N":
            if _candidate_ok(m_info):
                mm[i] = _Mate(m_info, 15)
            if _candidate_ok(p_info):
                pp[i] = _Mate(p_info, 15)
            mk = search(i)
            if mk == "M":
                lines[i] = [mm[i].c, mm[i].frag]
                marks[i] = "M"
            elif mk == "P":
                lines[i] = [pp[i].c, pp[i].frag]
                marks[i] = "P"

    return marks[0] + marks[1], lines[0] + lines[1]


def _specific_mapping(info: List[str]):
    """Pair mapped to only one parental genome (filtering.py:888-983)."""
    snp1 = int(info[7])
    snp2 = int(info[14])
    lines = [info[1], info[6], info[8], info[13]]
    has_cand = len(info) > 15

    if snp1 != 0 and snp2 != 0:
        return "Both", lines + ["Both"]
    if snp1 != 0 and snp2 == 0:
        if has_cand and info[-1] == "R2" and _candidate_ok(info) \
                and int(info[21]) != 0:
            return "Both", [info[1], info[6], info[15], info[20], "Both"]
        return "R1", lines + ["R1"]
    if snp1 == 0 and snp2 != 0:
        if has_cand and info[-1] == "R1" and _candidate_ok(info) \
                and int(info[21]) != 0:
            return "Both", [info[15], info[20], info[8], info[13], "Both"]
        return "R2", lines + ["R2"]
    # neither normal mate has SNPs: candidate rescue (filtering.py:960-977)
    if has_cand and _candidate_ok(info) and int(info[21]) != 0:
        if info[-1] == "R1":
            return "R1", [info[15], info[20], info[8], info[13], "R1"]
        return "R2", [info[1], info[6], info[15], info[20], "R2"]
    return "N", lines


def _load_sorted_frame(path: str):
    """Name-sorted bed as a 23-column all-string DataFrame (rows with 15
    columns carry NaN tails; values stay verbatim strings so outputs are
    byte-identical to the per-line path).

    The native external line sort feeds the frame read: an in-memory
    ``sort_values(0)`` was measured SLOWER (253 s vs 187 s at 10M pairs
    — argsort over 8M Python string objects loses to the C++ sort even
    with the temp-file round trip)."""
    import pandas as pd

    from ..io.native import sort_file

    tmp = path + ".name_sorted"
    sort_file(path, tmp, "name")
    try:
        # dtype=object, not str: pandas' str dtype builds arrow-backed
        # string arrays (measured ~10 s of the 15 s frame load at 2M rows)
        df = pd.read_csv(tmp, sep="\t", header=None, names=list(range(23)),
                         dtype=object, engine="c")
    except pd.errors.EmptyDataError:
        df = pd.DataFrame({i: pd.Series(dtype=str) for i in range(23)})
    finally:
        os.remove(tmp)
    return df


def _sorted_member(a: np.ndarray, b: np.ndarray):
    """(membership mask of a in sorted-unique b, insertion indices)."""
    if b.size == 0:
        return np.zeros(a.size, bool), np.zeros(a.size, np.int64)
    ins = np.searchsorted(b, a)
    safe = np.minimum(ins, b.size - 1)
    return (ins < b.size) & (b[safe] == a), ins


def _rows_of(df, idxs) -> List[List[str]]:
    """Materialize DataFrame rows back into the split-line list form the
    reference-faithful row paths consume (NaN tails stripped)."""
    arr = df.iloc[idxs].to_numpy()
    return [[x for x in row if x == x] for row in arr]


def _write_class(out, cols, tag=None, ids=None) -> None:
    """Bulk-append an output class: columns (+optional trailing tag,
    optional leading pair-id) via the pandas CSV writer."""
    import pandas as pd

    data = {}
    j = 0
    if ids is not None:
        data[j] = ids
        j += 1
    for a in cols:
        data[j] = a
        j += 1
    if tag is not None:
        data[j] = np.full(len(cols[0]), tag, dtype=object)
    pd.DataFrame(data).to_csv(out, sep="\t", header=False, index=False)


def _both_marks_arrays(m_df, mi, p_df, pi):
    """Vectorized ``_both_mapping`` over candidate-free pairs addressed by
    row indices (marks [n] of 2-char codes + the 4 output columns)."""
    n = mi.size
    out_marks = np.empty(n, dtype="U2")
    lines = [None] * 4
    for mate, (c_i, pos_i, score_i, frag_i, snp_i) in enumerate(
            ((1, 3, 5, 6, 7), (8, 10, 12, 13, 14))):
        mc = m_df[c_i].to_numpy()[mi]
        pc = p_df[c_i].to_numpy()[pi]
        mpos = m_df[pos_i].to_numpy()[mi].astype(np.int64)
        ppos = p_df[pos_i].to_numpy()[pi].astype(np.int64)
        msc = m_df[score_i].to_numpy()[mi].astype(np.int64)
        psc = p_df[score_i].to_numpy()[pi].astype(np.int64)
        msnp = m_df[snp_i].to_numpy()[mi].astype(np.int64)
        psnp = p_df[snp_i].to_numpy()[pi].astype(np.int64)
        same = (mc == pc) & (np.abs(mpos - ppos) <= 5)
        mark = np.full(n, "N", dtype="U1")
        mark[same & (msnp > 2 * psnp)] = "M"
        mark[same & (2 * msnp < psnp)] = "P"
        diff = ~same
        mark[diff & ((msc - psc) >= MAX_DIFF_SCORE) & (msnp >= 2 * psnp)] = "M"
        mark[diff & ((psc - msc) >= MAX_DIFF_SCORE) & (psnp >= 2 * msnp)] = "P"
        use_p = mark == "P"
        lines[2 * mate] = np.where(use_p, pc, mc)
        lines[2 * mate + 1] = np.where(use_p, p_df[frag_i].to_numpy()[pi],
                                       m_df[frag_i].to_numpy()[mi])
        if mate == 0:
            out_marks = mark.astype("U2")
        else:
            out_marks = np.char.add(out_marks, mark)
    return out_marks, lines


# emit_both's mark → (destination file, trailing tag, stats key) table
_BOTH_ROUTES = (("NN", "Bi_Allelic", None, "Bi_Allelic"),
                ("NM", "M_M", "R2", "Single_M"),
                ("MN", "M_M", "R1", "Single_M"),
                ("MM", "M_M", "Both", "Both_M"),
                ("NP", "P_P", "R2", "Single_P"),
                ("PN", "P_P", "R1", "Single_P"),
                ("PP", "P_P", "Both", "Both_P"),
                ("MP", "M_P", None, "Regroup"),
                ("PM", "P_M", None, "Regroup"))


def _assign_columnar(m_df, p_df, m_names, p_names, outs, S, save_id,
                     emit_specific, emit_both) -> int:
    """Columnar merge-join assignment: every candidate-free row/pair is
    classified with numpy column ops and written in one bulk append per
    class; only candidate-bearing rows (a few percent) take the
    reference-faithful per-row path.  The previous list-of-split-lines
    flow measured 582 s at 10M pairs on the 1-core host — dominated by
    16M str.split calls and per-row emits."""
    in_p, ins = _sorted_member(m_names, p_names)
    m_idx = np.flatnonzero(in_p)
    p_idx = ins[m_idx]
    in_m, _ = _sorted_member(p_names, m_names)
    count = len(m_names) + len(p_names) - m_idx.size

    m_cand = m_df[22].notna().to_numpy()
    p_cand = p_df[22].notna().to_numpy()

    # ---- single-genome (specific) rows -----------------------------------
    for side, df, cand, spec in (("M", m_df, m_cand, np.flatnonzero(~in_p)),
                                 ("P", p_df, p_cand, np.flatnonzero(~in_m))):
        key = "M_M" if side == "M" else "P_P"
        simple = spec[~cand[spec]]
        complex_idx = spec[cand[spec]]
        S[f"Speci_{side}"] += spec.size - complex_idx.size
        if simple.size:
            snp1 = df[7].to_numpy()[simple].astype(np.int64)
            snp2 = df[14].to_numpy()[simple].astype(np.int64)
            marks = np.full(simple.size, "N", dtype="U4")
            marks[(snp1 != 0) & (snp2 != 0)] = "Both"
            marks[(snp1 != 0) & (snp2 == 0)] = "R1"
            marks[(snp1 == 0) & (snp2 != 0)] = "R2"
            cols = [df[i].to_numpy()[simple] for i in (1, 6, 8, 13)]
            ids = df[0].to_numpy()[simple] if save_id else None
            for kind, dest in (("Both", key), ("R1", key), ("R2", key),
                               ("N", "Bi_Allelic")):
                sel = marks == kind
                if not sel.any():
                    continue
                _write_class(outs[dest], [a[sel] for a in cols],
                             tag=None if kind == "N" else kind,
                             ids=None if ids is None else ids[sel])
            n_both = int((marks == "Both").sum())
            n_single = int(((marks == "R1") | (marks == "R2")).sum())
            S[f"Both_{side}"] += n_both
            S[f"Speci_{side}_both"] += n_both
            S[f"Single_{side}"] += n_single
            S[f"Speci_{side}_single"] += n_single
            S["Bi_Allelic"] += int((marks == "N").sum())
        for row in _rows_of(df, complex_idx):
            emit_specific(row, side)

    # ---- both-genome pairs ------------------------------------------------
    simple = ~m_cand[m_idx] & ~p_cand[p_idx] if m_idx.size \
        else np.zeros(0, bool)
    sm, sp = m_idx[simple], p_idx[simple]
    if sm.size:
        marks, lines = _both_marks_arrays(m_df, sm, p_df, sp)
        ids = m_names[sm] if save_id else None
        for code, dest, tag, skey in _BOTH_ROUTES:
            sel = marks == code
            if not sel.any():
                continue
            _write_class(outs[dest], [a[sel] for a in lines], tag=tag,
                         ids=None if ids is None else ids[sel])
            S[skey] += int(sel.sum())
    m_complex = _rows_of(m_df, m_idx[~simple])
    p_complex = _rows_of(p_df, p_idx[~simple])
    for mr, pr in zip(m_complex, p_complex):
        mark, lines = _both_mapping(mr, pr)
        emit_both(mark, lines, mr[0])
    return count


def allelic_filtering(maternal_bed: str, paternal_bed: str, out_dir: str,
                      save_id: bool = False,
                      vectorized: bool = True) -> Dict[str, float]:
    """Merge-join the two name-sorted valid beds → the five allelic beds
    (filtering.py:989-1291).

    With ``vectorized`` (default), candidate-free pairs — the vast majority
    — are assigned with numpy column ops; candidate-bearing rows take the
    row-wise reference-faithful path.  Output file contents and statistics
    are identical to the row-wise implementation (row order within a file
    may differ; downstream binning is order-independent)."""
    os.makedirs(out_dir, exist_ok=True)
    prefix = os.path.split(maternal_bed)[-1].split("Maternal")[0] + "Valid"

    def load_sorted(path):
        # native external-memory whole-line sort (reference sorts whole
        # lines, filtering.py:474); Python fallback inside sort_file
        from ..io.native import sort_file

        tmp = path + ".name_sorted"
        sort_file(path, tmp, "name")
        rows = [line.split() for line in open(tmp)]
        os.remove(tmp)
        return rows

    outs = {k: open(os.path.join(out_dir, f"{prefix}_{k}.bed"), "w")
            for k in ("Bi_Allelic", "M_M", "P_P", "M_P", "P_M")}

    S = dict(Bi_Allelic=0, Both_M=0, Both_P=0, Single_M=0, Single_P=0,
             Regroup=0, Speci_M=0, Speci_P=0, Speci_M_single=0,
             Speci_M_both=0, Speci_P_single=0, Speci_P_both=0)

    def emit_specific(info, side):
        mark, lines = _specific_mapping(info)
        if save_id:
            lines = [info[0]] + lines  # aFiltering(save_ID) parity
        key = "M_M" if side == "M" else "P_P"
        S[f"Speci_{side}"] += 1
        if mark == "Both":
            S[f"Both_{side}"] += 1
            S[f"Speci_{side}_both"] += 1
            outs[key].write("\t".join(map(str, lines)) + "\n")
        elif mark in ("R1", "R2"):
            S[f"Single_{side}"] += 1
            S[f"Speci_{side}_single"] += 1
            outs[key].write("\t".join(map(str, lines)) + "\n")
        else:
            S["Bi_Allelic"] += 1
            outs["Bi_Allelic"].write("\t".join(map(str, lines)) + "\n")

    def emit_both(mark, lines, name):
        if save_id:
            lines = [name] + lines
        row = "\t".join(map(str, lines))
        if mark == "NN":
            S["Bi_Allelic"] += 1
            outs["Bi_Allelic"].write(row + "\n")
        elif mark in ("NM", "MN"):
            S["Single_M"] += 1
            outs["M_M"].write(row + ("\tR2\n" if mark == "NM" else "\tR1\n"))
        elif mark == "MM":
            S["Both_M"] += 1
            outs["M_M"].write(row + "\tBoth\n")
        elif mark in ("NP", "PN"):
            S["Single_P"] += 1
            outs["P_P"].write(row + ("\tR2\n" if mark == "NP" else "\tR1\n"))
        elif mark == "PP":
            S["Both_P"] += 1
            outs["P_P"].write(row + "\tBoth\n")
        elif mark == "MP":
            S["Regroup"] += 1
            outs["M_P"].write(row + "\n")
        elif mark == "PM":
            S["Regroup"] += 1
            outs["P_M"].write(row + "\n")

    uniq = False
    if vectorized:
        m_df = _load_sorted_frame(maternal_bed)
        p_df = _load_sorted_frame(paternal_bed)
        m_names = m_df[0].to_numpy()
        p_names = p_df[0].to_numpy()
        # the columnar fast path needs sorted-UNIQUE names on both sides
        uniq = (bool((m_names[1:] > m_names[:-1]).all())
                and bool((p_names[1:] > p_names[:-1]).all()))

    if vectorized and uniq:
        count = _assign_columnar(m_df, p_df, m_names, p_names, outs, S,
                                 save_id, emit_specific, emit_both)
    else:
        m_rows = load_sorted(maternal_bed)
        p_rows = load_sorted(paternal_bed)
        i = j = 0
        count = 0
        while i < len(m_rows) or j < len(p_rows):
            count += 1
            if i >= len(m_rows):
                emit_specific(p_rows[j], "P")
                j += 1
            elif j >= len(p_rows):
                emit_specific(m_rows[i], "M")
                i += 1
            else:
                mn, pn = m_rows[i][0], p_rows[j][0]
                if mn < pn:
                    emit_specific(m_rows[i], "M")
                    i += 1
                elif mn > pn:
                    emit_specific(p_rows[j], "P")
                    j += 1
                else:
                    mark, lines = _both_mapping(m_rows[i], p_rows[j])
                    emit_both(mark, lines, m_rows[i][0])
                    i += 1
                    j += 1
    for f in outs.values():
        f.close()

    total = count
    allelic_n = S["Both_M"] + S["Both_P"] + S["Single_M"] + S["Single_P"]
    report = {
        "Total_valid_pairs": total,
        "Bi_Allelic_pairs": S["Bi_Allelic"],
        "Maternal_Allelic_pairs": S["Both_M"] + S["Single_M"],
        "Paternal_Allelic_pairs": S["Both_P"] + S["Single_P"],
        "Maternal_both_sides_pairs": S["Both_M"],
        "Paternal_both_sides_pairs": S["Both_P"],
        "Maternal_single_side_pairs": S["Single_M"],
        "Paternal_single_side_pairs": S["Single_P"],
        "Speci_Maternal_Mapping_pairs": S["Speci_M"],
        "Speci_Paternal_Mapping_pairs": S["Speci_P"],
        "Speci_Maternal_both_sides_pairs": S["Speci_M_both"],
        "Speci_Paternal_both_sides_pairs": S["Speci_P_both"],
        "Speci_Maternal_single_sides_pairs": S["Speci_M_single"],
        "Speci_Paternal_single_sides_pairs": S["Speci_P_single"],
        "Recombination_pairs": S["Regroup"],
        "Allelic_Ratio": allelic_n / total if total else 0.0,
    }
    log.log(21, "allelic filtering: %s", report)
    return report
