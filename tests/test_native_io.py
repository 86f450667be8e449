"""Native hicio module: build, sort, merge, fallback parity."""

import os

import numpy as np
import pytest

from hichap_master_tpu.io.native import (
    count_lines,
    get_lib,
    merge_sorted,
    sort_file,
)


def _bed_line(rng, name):
    c1 = str(rng.integers(1, 23))
    c2 = str(rng.integers(1, 23))
    return "\t".join(
        [name, c1, str(rng.choice([0, 16])), str(rng.integers(1, 10**7)),
         "100", "-5", str(rng.integers(1, 10**7)), "0",
         c2, str(rng.choice([0, 16])), str(rng.integers(1, 10**7)),
         "100", "-7", str(rng.integers(1, 10**7)), "0"])


def test_native_builds():
    assert get_lib() is not None, "g++ available but libhicio failed to build"


def test_sort_by_name(tmp_path, rng):
    lines = [_bed_line(rng, f"read{int(i)}") for i in rng.permutation(500)]
    src = tmp_path / "in.bed"
    src.write_text("\n".join(lines) + "\n")
    out = tmp_path / "out.bed"
    sort_file(str(src), str(out), "name")
    got = out.read_text().splitlines()
    assert got == sorted(lines)
    assert count_lines(str(out)) == 500


def test_sort_by_hic_key(tmp_path, rng):
    lines = [_bed_line(rng, f"r{int(i)}") for i in range(300)]
    src = tmp_path / "in.bed"
    src.write_text("\n".join(lines) + "\n")
    out = tmp_path / "out.bed"
    sort_file(str(src), str(out), "hic_key")
    got = out.read_text().splitlines()

    def key(l):
        f = l.split("\t")
        return (f[1], int(f[2]), int(f[3]), f[8], int(f[9]), int(f[10]))

    assert got == sorted(lines, key=key)


def test_merge_sorted(tmp_path, rng):
    a = sorted(_bed_line(rng, f"a{int(i):04d}") for i in range(100))
    b = sorted(_bed_line(rng, f"b{int(i):04d}") for i in range(80))
    (tmp_path / "a.bed").write_text("\n".join(a) + "\n")
    (tmp_path / "b.bed").write_text("\n".join(b) + "\n")
    out = tmp_path / "m.bed"
    merge_sorted([str(tmp_path / "a.bed"), str(tmp_path / "b.bed")],
                 str(out), "name")
    got = out.read_text().splitlines()
    assert got == sorted(a + b)


def test_sam_sort_merge(tmp_path, rng):
    from hichap_master_tpu.io.native import sam_sort_merge

    paths = []
    expected = []
    for i in range(3):
        p = tmp_path / f"f{i}.sam"
        lines = [f"@HD\tVN:1.0"]
        for j in range(50):
            q = f"r{rng.integers(0, 40)}_{i}"
            lines.append(f"{q}\t0\tchr1\t{j+1}\t42\t*\t*\t0\t0\tACGT\tIIII")
            expected.append((q, i, j))
        p.write_text("\n".join(lines) + "\n")
        paths.append(str(p))
    out = tmp_path / "merged.sam"
    sam_sort_merge(paths, str(out))
    got = [l.split("\t")[0] for l in out.read_text().splitlines()]
    expected.sort(key=lambda t: (t[0], t[1], t[2]))  # stable by (file, line)
    assert got == [q for q, _, _ in expected]
    # no headers in the body
    assert all(not g.startswith("@") for g in got)


def test_read_sam_sorted_by_name_native_parity(tmp_path, rng, monkeypatch):
    import hichap_master_tpu.io.sam as sam_mod
    from hichap_master_tpu.io.sam import read_sam_sorted_by_name, write_sam
    from hichap_master_tpu.io.sam import AlnRecord

    paths = []
    for i in range(2):
        recs = [AlnRecord(query_name=f"q{rng.integers(0, 30)}", flag=0,
                          reference_name="chr1", pos=int(j), mapq=40,
                          seq="ACGT", qual="IIII", tag_as=0, tag_xs=None)
                for j in range(40)]
        p = tmp_path / f"a{i}.sam"
        write_sam(str(p), recs)
        paths.append(str(p))

    py = read_sam_sorted_by_name(paths)
    monkeypatch.setattr(sam_mod, "_NATIVE_MERGE_MIN_BYTES", 0)
    nat = read_sam_sorted_by_name(paths)
    assert [(r.query_name, r.pos, r.flag) for r in nat] == \
        [(r.query_name, r.pos, r.flag) for r in py]


def test_sam_sort_merge_spill_path(tmp_path, rng, monkeypatch):
    # force external-memory spills with a tiny chunk threshold
    import hichap_master_tpu.io.native as native
    if native.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    monkeypatch.setenv("HICIO_CHUNK_BYTES", "256")
    from hichap_master_tpu.io.native import sam_sort_merge

    paths, expected = [], []
    for i in range(2):
        p = tmp_path / f"s{i}.sam"
        lines = []
        for j in range(200):
            q = f"n{rng.integers(0, 60):03d}"
            lines.append(f"{q}\t0\tchr1\t{j+1}\t42\t*\t*\t0\t0\tAC\tII")
            expected.append((q, i, j, lines[-1]))
        p.write_text("\n".join(lines) + "\n")
        paths.append(str(p))
    out = tmp_path / "m.sam"
    sam_sort_merge(paths, str(out))
    got = out.read_text().splitlines()
    expected.sort(key=lambda t: (t[0], t[1], t[2]))
    assert got == [l for _, _, _, l in expected]
    # spill chunks cleaned up
    assert not list(tmp_path.glob("m.sam.schk*"))
