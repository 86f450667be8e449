"""Streaming hic_filtering: multi-chunk external sort + blockwise
classification must match a single in-memory recount, including duplicates
that straddle chunk files and classification blocks."""

import os

import numpy as np
import pytest

from hichap_master_tpu.pipeline.filtering import hic_filtering


def _bed(name, c1, s1, p1, f1, c2, s2, p2, f2):
    return "\t".join(map(str, [
        name, c1, s1, p1, 100, -5, f1, 0,
        c2, s2, p2, 100, -7, f2, 0])) + "\n"


def _random_lines(rng, n, tag):
    lines = []
    for k in range(n):
        c1, c2 = rng.choice(["1", "2", "3"], 2)
        p1 = int(rng.integers(1, 2000))
        p2 = int(rng.integers(1, 2000))
        s1 = int(rng.choice([0, 16]))
        s2 = int(rng.choice([0, 16]))
        f1, f2 = (p1 // 300) * 300, (p2 // 300) * 300
        lines.append(_bed(f"{tag}{k}", c1, s1, p1, f1, c2, s2, p2, f2))
    return lines


def _oracle(all_lines):
    """Round-1 in-memory implementation as the recount oracle."""
    keys = [ln.split("\t", 14) for ln in all_lines]
    c1 = np.array([k[1] for k in keys])
    s1 = np.array([int(k[2]) for k in keys])
    p1 = np.array([int(k[3]) for k in keys])
    c2 = np.array([k[8] for k in keys])
    s2 = np.array([int(k[9]) for k in keys])
    p2 = np.array([int(k[10]) for k in keys])
    f1 = np.array([int(k[6]) for k in keys])
    f2 = np.array([int(k[13]) for k in keys])
    order = np.lexsort((p2, s2, c2, p1, s1, c1))
    c1, s1, p1, c2, s2, p2, f1, f2 = (a[order] for a in
                                      (c1, s1, p1, c2, s2, p2, f1, f2))
    lines = [all_lines[i] for i in order]
    n = len(lines)
    first = np.ones(n, bool)
    same = ((c1[1:] == c1[:-1]) & (s1[1:] == s1[:-1]) & (p1[1:] == p1[:-1])
            & (c2[1:] == c2[:-1]) & (s2[1:] == s2[:-1]) & (p2[1:] == p2[:-1]))
    first[1:] = ~same
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
    valid = first & ~sc & ~de & ~um & ~ed
    stats = dict(Total=n, Duplicates=int((~first).sum()),
                 Valid=int(valid.sum()),
                 SelfCircle=int((sc & first).sum()),
                 DanglingEnds=int((de & first).sum()),
                 UnknownMechanism=int((um & first).sum()),
                 ExtraDanglingEnds=int((ed & first).sum()))
    return stats, sorted(ln for ln, v in zip(lines, valid) if v)


@pytest.mark.parametrize("block_lines", [7, 100000])
def test_streaming_matches_oracle(tmp_path, rng, block_lines, monkeypatch):
    # tiny native spill threshold: exercises the external-memory sort path
    monkeypatch.setenv("HICIO_CHUNK_BYTES", "4096")
    bed_dir = tmp_path / "beds"
    out_dir = tmp_path / "out"
    bed_dir.mkdir()
    chunks = [_random_lines(rng, 120, f"c{i}_") for i in range(4)]
    # plant cross-chunk duplicates (same 6-field key, different names)
    dup = _bed("dupA", "1", 0, 55, 0, "2", 16, 77, 0)
    chunks[0].append(dup)
    chunks[3].append(_bed("dupB", "1", 0, 55, 0, "2", 16, 77, 0))
    all_lines = []
    for i, ch in enumerate(chunks):
        (bed_dir / f"cell_chunk{i}.bed").write_text("".join(ch))
        all_lines.extend(ch)

    stats = hic_filtering(str(bed_dir), str(out_dir), "NonAllelic",
                          clean=False, block_lines=block_lines)
    want_stats, want_valid = _oracle(all_lines)
    assert stats == want_stats
    assert stats["Duplicates"] >= 1
    got = sorted((out_dir / "cell_Valid.bed").read_text().splitlines(True))
    assert got == want_valid
    # no temp files left behind
    leftovers = [f for f in os.listdir(out_dir) if "ksorted" in f]
    assert leftovers == []
