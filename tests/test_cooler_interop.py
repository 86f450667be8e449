"""Stock-`cooler` interoperability contract for io/cooler.py.

The reference's outputs live inside the cooler ecosystem
(HiCHap/matrixBuilding.py:100-303); every downstream consumer reads the
files with the cooler package.  These tests open our written ``.cool``
with the real package and check bins/pixels/weights round-trip and
balanced-matrix parity with ``CoolerReader``.  They skip when the package
is absent (it is not shipped in this environment — install the ``cooler``
dev extra to run them), but the contract stays executable.
"""

import numpy as np
import pytest

cooler = pytest.importorskip("cooler")

from hichap_master_tpu.core import Genome
from hichap_master_tpu.io.cooler import CoolerReader, write_cooler
from hichap_master_tpu.pipeline.matrix import _write_weights
from hichap_master_tpu.testing.oracles import synthetic_contact_matrix


@pytest.fixture
def written(tmp_path, rng):
    # one exact-multiple length: pins the trailing-bin bin-table edge
    g = Genome({"1": 900_000, "2": 730_000, "X": 400_000})
    res = 100_000
    mats = {c: synthetic_contact_matrix(rng, g.n_bins(c, res))
            for c in g.labels}
    path = str(tmp_path / "t.cool")
    write_cooler(path, g, res, mats, dtype="int",
                 metadata={"onlyIntra": "True"})
    _write_weights(path, g, res, cis_only=True)
    return path, g, res, mats


def test_stock_cooler_opens_and_round_trips(written):
    path, g, res, mats = written
    c = cooler.Cooler(f"{path}::/{res}")
    assert c.binsize == res
    assert list(c.chromnames) == list(g.labels)
    bins = c.bins()[:]
    assert "weight" in bins.columns
    ours = CoolerReader(path, res)
    b1, b2, v = ours.pixels_coo()
    px = c.pixels()[:]
    np.testing.assert_array_equal(px["bin1_id"].to_numpy(), b1)
    np.testing.assert_array_equal(px["bin2_id"].to_numpy(), b2)
    np.testing.assert_array_equal(px["count"].to_numpy(), v)


def test_stock_cooler_balanced_matrix_parity(written):
    path, g, res, mats = written
    c = cooler.Cooler(f"{path}::/{res}")
    ours = CoolerReader(path, res)
    for label in g.labels:
        theirs = np.nan_to_num(
            c.matrix(balance=True).fetch(label))
        raw = ours.matrix(label, balance=False)
        w = ours.bins_weight(label)
        mine = np.nan_to_num(raw * w[:, None] * w[None, :])
        np.testing.assert_allclose(theirs, mine[: theirs.shape[0],
                                                : theirs.shape[1]],
                                   rtol=1e-6, atol=1e-12)


def test_stock_cooler_info_fields(written):
    path, _g, res, _m = written
    c = cooler.Cooler(f"{path}::/{res}")
    info = c.info
    assert info["format"] == "HDF5::Cooler"
    assert int(info["nbins"]) == len(c.bins()[:])
    assert int(info["nnz"]) == len(c.pixels()[:])
