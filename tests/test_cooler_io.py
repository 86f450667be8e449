"""Cooler-format roundtrip tests (multi-res groups, weights, genome-wide)."""

import numpy as np
import pytest

from hichap_master_tpu.core import Genome
from hichap_master_tpu.io import CoolerReader, write_cooler, list_resolutions
from hichap_master_tpu.testing.oracles import synthetic_contact_matrix


@pytest.fixture
def genome():
    return Genome({"1": 800_000, "2": 600_000, "X": 400_000})


def test_roundtrip_intra(tmp_path, rng, genome):
    res = 10_000
    mats = {c: synthetic_contact_matrix(rng, genome.n_bins(c, res), gap_frac=0)
            for c in genome}
    path = str(tmp_path / "t.cool")
    uri = write_cooler(path, genome, res, mats)
    assert uri == f"{path}::{res}"
    r = CoolerReader(path, res)
    assert r.chromnames == ["1", "2", "X"]
    assert r.res == res
    for c in genome:
        nb = genome.cooler_n_bins(c, res)
        got = r.matrix(c)
        np.testing.assert_array_equal(got, mats[c][:nb, :nb])


def test_multires_groups(tmp_path, rng, genome):
    path = str(tmp_path / "m.cool")
    for res in (10_000, 40_000):
        mats = {c: synthetic_contact_matrix(rng, genome.n_bins(c, res), gap_frac=0)
                for c in genome}
        write_cooler(path, genome, res, mats)
    assert list_resolutions(path) == [10_000, 40_000]
    r = CoolerReader(path, 40_000)
    assert r.res == 40_000


def test_weights_roundtrip(tmp_path, rng, genome):
    res = 20_000
    mats = {c: synthetic_contact_matrix(rng, genome.n_bins(c, res), gap_frac=0)
            for c in genome}
    path = str(tmp_path / "w.cool")
    write_cooler(path, genome, res, mats)
    r = CoolerReader(path, res)
    w = rng.random(r.nbins)
    r.set_weights(w)
    r2 = CoolerReader(path, res)
    np.testing.assert_allclose(r2.bins_weight(), w)
    M = r2.matrix("1", balance=True)
    w1 = r2.bins_weight("1")
    raw = r2.matrix("1")
    np.testing.assert_allclose(M, raw * w1[:, None] * w1[None, :])


def test_genomewide_roundtrip(tmp_path, rng, genome):
    res = 50_000
    total = genome.total_bins(res)
    M = synthetic_contact_matrix(rng, total, gap_frac=0, scale=5.0)
    path = str(tmp_path / "g.cool")
    write_cooler(path, genome, res, {}, genomewide=M)
    r = CoolerReader(path, res)
    offs = genome.bin_offsets(res)
    for c in genome:
        s, e = offs[c]
        nb = genome.cooler_n_bins(c, res)
        np.testing.assert_array_equal(r.matrix(c), M[s : s + nb, s : s + nb])
    # inter block
    s1, _ = offs["1"]; s2, _ = offs["2"]
    n1 = genome.cooler_n_bins("1", res); n2 = genome.cooler_n_bins("2", res)
    np.testing.assert_array_equal(
        r.matrix_between("1", "2"), M[s1 : s1 + n1, s2 : s2 + n2])


def test_exact_multiple_length_edge(tmp_path, rng):
    # length an exact multiple of res: matrix convention has one extra
    # (always-empty) trailing bin vs the cooler bin table.
    g = Genome({"1": 400_000})
    res = 100_000
    assert g.n_bins("1", res) == 5 and g.cooler_n_bins("1", res) == 4
    M = np.zeros((5, 5)); M[0, 1] = 3; M[1, 0] = 3; M[2, 2] = 7
    path = str(tmp_path / "e.cool")
    write_cooler(path, g, res, {"1": M})
    r = CoolerReader(path, res)
    got = r.matrix("1")
    assert got.shape == (4, 4)
    np.testing.assert_array_equal(got, M[:4, :4])
