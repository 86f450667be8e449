"""Raw-HDF5 audit of our .cool output against the PUBLISHED cooler schema.

Stock ``cooler`` cannot be installed in this environment (zero network
egress — ``pip install cooler`` fails at DNS, recorded in PERF.md), so the
interop tests in test_cooler_interop.py permanently skip here.  This audit
is the strongest executable substitute: it re-derives the cooler
format-version-3 contract from the published schema document
(https://cooler.readthedocs.io/en/latest/schema.html — the single-
resolution data collection: chroms/bins/pixels/indexes tables, required
attributes, symmetric-upper pixel ordering, offset-index invariants) and
checks the file with h5py alone — no code path shared with
``io/cooler.py``'s reader.  A file passing this audit is structurally what
``cooler.Cooler`` parses; the remaining untested surface is cooler's own
tolerance quirks, which only the real package (or the skipping tests) can
prove.  Reference output contract: HiCHap/matrixBuilding.py:100-303.
"""

import h5py
import numpy as np
import pytest

from hichap_master_tpu.core import Genome
from hichap_master_tpu.io.cooler import write_cooler
from hichap_master_tpu.pipeline.matrix import _write_weights
from hichap_master_tpu.testing.oracles import synthetic_contact_matrix

RES = 100_000


@pytest.fixture
def written(tmp_path, rng):
    # one exact-multiple chromosome length pins the trailing-bin edge;
    # chromosomes are large enough (>=34 bins) that ICE's min_nnz/mad_max
    # filters keep a finite weight population
    g = Genome({"1": 5_000_000, "2": 3_700_000, "X": 3_400_000})
    mats = {c: synthetic_contact_matrix(rng, g.n_bins(c, RES))
            for c in g.labels}
    path = str(tmp_path / "audit.cool")
    write_cooler(path, g, RES, mats, dtype="int",
                 metadata={"onlyIntra": "True"})
    _write_weights(path, g, RES, cis_only=True)
    return path, g


def _group(f):
    return f[str(RES)]


def test_required_tables_and_dtypes(written):
    path, g = written
    with h5py.File(path, "r") as f:
        grp = _group(f)
        for t in ("chroms", "bins", "pixels", "indexes"):
            assert t in grp, f"missing table {t}"
        assert grp["chroms/name"].dtype.kind == "S"
        assert grp["chroms/length"].dtype.kind == "i"
        assert grp["bins/chrom"].dtype.kind in ("i", "u")
        assert grp["bins/start"].dtype.kind == "i"
        assert grp["bins/end"].dtype.kind == "i"
        assert grp["bins/weight"].dtype == np.float64
        # 64-bit pixel ids and offsets: anything narrower truncates at
        # genome-wide 1 kb scale
        assert grp["pixels/bin1_id"].dtype == np.int64
        assert grp["pixels/bin2_id"].dtype == np.int64
        assert grp["pixels/count"].dtype.kind in ("i", "f")
        assert grp["indexes/chrom_offset"].dtype == np.int64
        assert grp["indexes/bin1_offset"].dtype == np.int64


def test_required_attrs(written):
    path, g = written
    with h5py.File(path, "r") as f:
        grp = _group(f)
        a = grp.attrs
        fmt = a["format"]
        fmt = fmt.decode() if isinstance(fmt, bytes) else str(fmt)
        assert fmt == "HDF5::Cooler"
        assert int(a["format-version"]) == 3
        bt = a["bin-type"]
        assert (bt.decode() if isinstance(bt, bytes) else str(bt)) == "fixed"
        assert int(a["bin-size"]) == RES
        sm = a["storage-mode"]
        assert (sm.decode() if isinstance(sm, bytes)
                else str(sm)) == "symmetric-upper"
        assert int(a["nchroms"]) == len(grp["chroms/name"])
        assert int(a["nbins"]) == len(grp["bins/start"])
        assert int(a["nnz"]) == len(grp["pixels/count"])


def test_bin_table_invariants(written):
    path, g = written
    with h5py.File(path, "r") as f:
        grp = _group(f)
        names = [n.decode() for n in grp["chroms/name"][:]]
        lengths = grp["chroms/length"][:]
        assert names == list(g.labels)
        chrom = grp["bins/chrom"][:]
        start = grp["bins/start"][:].astype(np.int64)
        end = grp["bins/end"][:].astype(np.int64)
        off = grp["indexes/chrom_offset"][:]
        assert off[0] == 0 and off[-1] == len(start)
        assert (np.diff(off) > 0).all()
        for ci, (nm, ln) in enumerate(zip(names, lengths)):
            sl = slice(off[ci], off[ci + 1])
            assert (chrom[sl] == ci).all()
            s, e = start[sl], end[sl]
            nb = (int(ln) + RES - 1) // RES  # cooler binnify convention
            assert sl.stop - sl.start == nb
            np.testing.assert_array_equal(s, np.arange(nb) * RES)
            np.testing.assert_array_equal(
                e, np.minimum(np.arange(1, nb + 1) * RES, int(ln)))


def test_pixel_ordering_and_offset_index(written):
    path, g = written
    with h5py.File(path, "r") as f:
        grp = _group(f)
        b1 = grp["pixels/bin1_id"][:]
        b2 = grp["pixels/bin2_id"][:]
        v = grp["pixels/count"][:]
        nbins = int(grp.attrs["nbins"])
        assert (b2 >= b1).all(), "storage-mode symmetric-upper violated"
        assert (b1 >= 0).all() and (b2 < nbins).all()
        key = b1 * np.int64(nbins) + b2
        assert (np.diff(key) > 0).all(), "pixels not strictly (b1,b2) sorted"
        assert (v != 0).all()
        bo = grp["indexes/bin1_offset"][:]
        assert len(bo) == nbins + 1
        np.testing.assert_array_equal(
            bo, np.searchsorted(b1, np.arange(nbins + 1)))


def test_weight_column_semantics(written):
    path, g = written
    with h5py.File(path, "r") as f:
        grp = _group(f)
        w = grp["bins/weight"][:]
        assert w.shape == (int(grp.attrs["nbins"]),)
        finite = np.isfinite(w)
        assert finite.any(), "balancing produced no finite weights"
        assert (w[finite] > 0).all()
        # filtered bins are NaN (cooler-balance convention), never 0/inf
        assert not np.isinf(w).any()
