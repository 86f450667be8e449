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
