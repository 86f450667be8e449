"""Pure-Python fallbacks of io/native must match the native paths."""

import numpy as np
import pytest

import hichap_master_tpu.io.native as native


@pytest.fixture
def no_lib(monkeypatch):
    monkeypatch.setattr(native, "get_lib", lambda: None)


def _lines(rng, n=200):
    return [f"r{rng.integers(0, 50):03d}\t{i}\tchr1\t{int(rng.integers(1, 9))}"
            f"\n" for i in range(n)]


def test_sort_file_fallback(tmp_path, rng, no_lib):
    src = tmp_path / "in.txt"
    src.write_text("".join(_lines(rng)))
    out = tmp_path / "out.txt"
    native.sort_file(str(src), str(out), mode="name")
    got = out.read_text().splitlines()
    assert got == sorted(src.read_text().splitlines())


def test_merge_sorted_fallback(tmp_path, rng, no_lib):
    parts = []
    for i in range(3):
        p = tmp_path / f"p{i}.txt"
        p.write_text("".join(sorted(_lines(rng, 60))))
        parts.append(str(p))
    out = tmp_path / "m.txt"
    native.merge_sorted(parts, str(out), mode="name")
    got = out.read_text().splitlines()
    assert got == sorted(got)
    assert len(got) == 180


def test_count_lines_fallback(tmp_path, no_lib):
    p = tmp_path / "c.txt"
    p.write_text("a\nb\nc\n")
    assert native.count_lines(str(p)) == 3


def test_sam_sort_merge_fallback_matches_native(tmp_path, rng, monkeypatch):
    paths = []
    for i in range(2):
        p = tmp_path / f"s{i}.sam"
        lines = ["@HD\tVN:1.0"]
        for j in range(80):
            q = f"q{rng.integers(0, 30):02d}"
            lines.append(f"{q}\t0\tchr1\t{j+1}\t40\t*\t*\t0\t0\tAC\tII")
        p.write_text("\n".join(lines) + "\n")
        paths.append(str(p))
    out_native = tmp_path / "n.sam"
    native.sam_sort_merge(paths, str(out_native))
    monkeypatch.setattr(native, "get_lib", lambda: None)
    out_py = tmp_path / "p.sam"
    native.sam_sort_merge(paths, str(out_py))
    assert out_py.read_text() == out_native.read_text()
