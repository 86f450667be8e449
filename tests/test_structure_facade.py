"""StructureFind facade: the reference's documented library API
(README.md:348-397, StructureFind.py:27-106) end-to-end."""

import os

import numpy as np
import pytest

from hichap_master_tpu.core import Genome
from hichap_master_tpu.io import CoolerReader, write_cooler
from hichap_master_tpu.models.structure import StructureFind

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
    for _ in range(6):
        x = int(rng.integers(5, n - 60))
        y = x + int(rng.integers(10, 45))
        M[x, y] = M[y, x] = M[x, y] * 8 + 80
    path = str(tmp_path / "s.cool")
    write_cooler(path, g, RES, {"1": M})
    r = CoolerReader(path, RES)
    r.set_weights(np.ones(r.nbins))
    return path


def test_structurefind_reference_api(cool, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # the reference builds "file.cool::res" URIs itself — accept them too
    sf = StructureFind(f"{cool}::{RES}", RES, False, Loop_strength=4)
    sf.run_Compartment(str(tmp_path / "PC"), plot=False)
    sf.run_TADs(str(tmp_path / "TAD"), minTAD=120_000, window=400_000,
                plot=False)
    sf.run_Loops(str(tmp_path / "LP"))
    assert os.listdir(tmp_path / "PC")
    assert any("Domain" in f for f in os.listdir(tmp_path / "TAD"))
    assert any(f.startswith("Cluster_Selected")
               for f in os.listdir(tmp_path / "LP"))
