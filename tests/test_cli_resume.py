"""CLI --resume: a stage whose outputs exist is skipped, without it the
stage reruns (checkpoint/resume contract, SURVEY §5)."""

import os

import numpy as np
import pytest

from hichap_master_tpu.cli import run
from hichap_master_tpu.testing.synthetic import diploid_dataset


@pytest.fixture
def ws(tmp_path, rng):
    data = diploid_dataset(rng, str(tmp_path / "data"), n_pairs=60,
                           n_snps=10, read_len=40)
    return tmp_path, data


def _chunks_mtime(ws_dir):
    d = os.path.join(ws_dir, "fastqchunks")
    return {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}


def test_resume_skips_completed_stage(ws, monkeypatch):
    tmp_path, data = ws
    monkeypatch.chdir(tmp_path)
    base = ["-w", "wsdir", "-1", data["fq1"], "-2", data["fq2"], "-c", "30"]
    assert run(["rebuildF"] + base) == 0
    first = _chunks_mtime("wsdir")
    assert first, "chunking produced no files"

    # resume: outputs present → stage skipped, files untouched
    assert run(["rebuildF", "-r"] + base) == 0
    assert _chunks_mtime("wsdir") == first

    # no resume flag → stage reruns (mtimes move)
    import time
    time.sleep(0.05)
    assert run(["rebuildF"] + base) == 0
    second = _chunks_mtime("wsdir")
    assert set(second) == set(first)
    assert any(second[f] != first[f] for f in first)
