"""Full diploid pipeline through the CLI surface (C1): every sub-command in
order on a hermetic synthetic workspace, FakeAligner, 2-worker spawn pools."""

import os

import numpy as np
import pytest

from hichap_master_tpu.cli import run
from hichap_master_tpu.testing.synthetic import diploid_dataset


@pytest.mark.slow
def test_cli_full_chain(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    data = diploid_dataset(rng, str(tmp_path / "data"), n_pairs=200,
                           n_snps=40, read_len=40)
    ws = ["-w", "wsdir"]

    assert run(["rebuildG", *ws, "-g", data["fasta"], "-S", data["snps"],
                "-e", "MboI"]) == 0
    assert run(["rebuildF", *ws, "-1", data["fq1"], "-2", data["fq2"],
                "-c", "100", "-t", "2"]) == 0
    idx = ["wsdir/genome/Maternal/Maternal.fa",
           "wsdir/genome/Paternal/Paternal.fa"]
    assert run(["GlobalMapping", *ws, "-i", *idx, "-wt", "2",
                "--fake-aligner"]) == 0
    assert run(["Rescue", *ws, "-e", "MboI"]) == 0
    assert run(["ReMapping", *ws, "-i", *idx, "-wt", "2",
                "--fake-aligner"]) == 0
    assert run(["bamProcess", *ws,
                "-f", "wsdir/genome/Maternal/MboI_Maternal_fragments.txt",
                "wsdir/genome/Paternal/MboI_Paternal_fragments.txt",
                "-s", "wsdir/genome/Snps.npz", "-t", "2",
                "--readlen", "40"]) == 0
    assert run(["filtering", *ws, "-t", "2"]) == 0
    assert run(["matrix", *ws, "-b", "wsdir/Allelic_Bed", "-o", "wsdir/Mat",
                "-gs", "wsdir/genome/genomeSize",
                "-wR", "10000", "-lR", "5000", "-region", "50000"]) == 0

    coolers = os.listdir("wsdir/Mat/Cooler")
    assert any(f.endswith(".cool") for f in coolers), coolers
    # per-command metrics were persisted
    metrics = os.listdir("wsdir/Metrics")
    for cmd in ("rebuildG", "GlobalMapping", "bamProcess", "filtering",
                "matrix"):
        assert f"{cmd}.json" in metrics, metrics


def test_cli_matrix_genomesize_hint(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.makedirs("wsdir", exist_ok=True)
    with pytest.raises(FileNotFoundError, match="rebuildG"):
        run(["matrix", "-w", "wsdir", "-b", "beds", "-o", "out",
             "-gs", "missing_file", "-wR", "10000"])


def test_cli_nonallelic_chain(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    data = diploid_dataset(rng, str(tmp_path / "data"), n_pairs=150,
                           n_snps=10, read_len=40)
    ws = ["-w", "wsdir"]

    assert run(["rebuildG", *ws, "-N", "-g", data["fasta"],
                "-e", "MboI"]) == 0
    assert run(["rebuildF", *ws, "-1", data["fq1"], "-2", data["fq2"],
                "-c", "100"]) == 0
    # non-allelic: one index — the raw genome is used in place (reference
    # behavior: rebuildG -N indexes the input FASTA, no workspace copy)
    raw_fa = data["fasta"]
    assert run(["GlobalMapping", *ws, "-i", raw_fa, "--fake-aligner"]) == 0
    assert run(["Rescue", *ws, "-e", "MboI"]) == 0
    assert run(["ReMapping", *ws, "-i", raw_fa, "--fake-aligner"]) == 0
    frag = next(os.path.join(r, f) for r, _, fs in os.walk("wsdir/genome")
                for f in fs if f.endswith("fragments.txt"))
    assert run(["bamProcess", *ws, "-N", "-f", frag,
                "--readlen", "40"]) == 0
    assert run(["filtering", *ws, "-N"]) == 0
    assert run(["matrix", *ws, "-N", "-b", "wsdir/Filtered_Bed",
                "-o", "wsdir/Mat", "-gs", "wsdir/genome/genomeSize",
                "-wR", "10000", "-lR", "5000"]) == 0
    coolers = os.listdir("wsdir/Mat/Cooler")
    assert any(f.endswith(".cool") for f in coolers), coolers
