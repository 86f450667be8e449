"""Analysis sub-commands (compartment/tads/loops/specificity) through the
CLI surface on a synthetic cooler."""

import os

import numpy as np
import pytest

from hichap_master_tpu.cli import run
from hichap_master_tpu.core import Genome
from hichap_master_tpu.io import CoolerReader, write_cooler

RES = 40_000


@pytest.fixture
def cool(tmp_path, rng):
    g = Genome({"1": 4_000_000})
    n = g.n_bins("1", RES)
    i = np.arange(n)
    d = np.abs(np.subtract.outer(i, i)) + 1.0
    same = np.equal.outer(i // 20, i // 20)
    M = rng.poisson(60.0 / d**0.8 * np.where(same, 4.0, 1.0)).astype(
        np.float32)
    M = np.triu(M) + np.triu(M, 1).T
    for _ in range(8):
        x = int(rng.integers(5, n - 60))
        y = x + int(rng.integers(10, 45))
        M[x, y] = M[y, x] = M[x, y] * 8 + 80
    path = str(tmp_path / "a.cool")
    write_cooler(path, g, RES, {"1": M})
    r = CoolerReader(path, RES)
    r.set_weights(np.ones(r.nbins))
    return path


def test_cli_compartment(cool, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "PC")
    assert run(["compartment", "-w", "wsdir", "-c", cool,
                "-R", str(RES), "-o", out]) == 0
    files = os.listdir(out)
    assert any("PC" in f or f.endswith(".txt") for f in files), files


def test_cli_tads(cool, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "TAD")
    assert run(["tads", "-w", "wsdir", "-c", cool, "-R", str(RES),
                "-o", out, "--minTAD", "120000", "--window", "400000"]) == 0
    names = os.listdir(out)
    assert any("Domain" in f for f in names), names
    assert any("DI" in f for f in names), names


@pytest.mark.slow
def test_cli_loops(cool, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "LP")
    assert run(["loops", "-w", "wsdir", "-c", cool, "-R", str(RES),
                "-o", out, "--loop-strength", "4"]) == 0
    names = os.listdir(out)
    assert any(f.startswith("Cluster_Selected") for f in names), names


def test_cli_specificity_compartment(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    n = 80
    m = rng.normal(0, 1, n)
    p = m.copy()
    p[10:14] = -p[10:14] - 2.0  # strongly discordant bins
    for name, vals in (("m_pc.txt", m), ("p_pc.txt", p)):
        with open(name, "w") as f:
            for v in vals:
                f.write(f"1\t{v:.6f}\n")
    assert run(["specificity", "compartment", "-w", "wsdir",
                "-R", "500000", "-i", "m_pc.txt", "p_pc.txt",
                "-o", "comp_spec.txt"]) == 0
    lines = open("comp_spec.txt").read().splitlines()
    assert len(lines) > 1, lines[:3]


def test_cli_allelic_analyses(tmp_path, rng, monkeypatch):
    """compartment/tads/loops with -A Maternal at the CLI surface."""
    from hichap_master_tpu.core import Genome as _G
    from hichap_master_tpu.io import write_cooler as _wc

    monkeypatch.chdir(tmp_path)
    n, res = 150, 40_000
    g = _G({"1": n * res - res // 2})
    hap = g.haplotype()
    i = np.arange(n)
    d = np.abs(np.subtract.outer(i, i)).astype(float)
    same = np.equal.outer(i // 15, i // 15)
    mats = {}
    for c in ("M1", "P1"):
        lam = (40.0 / (1 + d) + 0.3) * np.where(same, 3.0, 1.0)
        lam[30, 55] *= 8
        M = rng.poisson(lam).astype(float)
        mats[c] = np.triu(M) + np.triu(M, 1).T
    path = str(tmp_path / "hap.cool")
    _wc(path, hap, res, mats, dtype="float")
    gap_file = str(tmp_path / "gaps.npz")
    np.savez(gap_file, **{str(res): np.array(
        {"M1": np.array([0]), "P1": np.array([0])}, dtype=object)})
    with open("trad_pc.txt", "w") as f:
        for v in rng.normal(0, 1, n):
            f.write(f"1\t{v:.5f}\n")

    assert run(["compartment", "-w", "wsdir", "-c", path, "-R", str(res),
                "-A", "Maternal", "-o", str(tmp_path / "MPC"),
                "--traditional-pc", "trad_pc.txt"]) == 0
    assert run(["tads", "-w", "wsdir", "-c", path, "-R", str(res),
                "-A", "Maternal", "-o", str(tmp_path / "MTAD"),
                "--minTAD", "120000", "--window", "400000"]) == 0
    assert run(["loops", "-w", "wsdir", "-c", path, "-R", str(res),
                "-A", "Maternal", "-o", str(tmp_path / "MLP"),
                "--gap-file", gap_file]) == 0
    assert os.listdir(tmp_path / "MPC")
    assert any("Domain" in f for f in os.listdir(tmp_path / "MTAD"))
    assert os.listdir(tmp_path / "MLP")
