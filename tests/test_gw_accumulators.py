"""Oracle parity for the sparse genome-wide accumulators.

Both backends — the native C++ hash (io/native.gw_accumulator) and the
numpy merge-compaction fallback (sort the pending block, run-length
reduce, searchsorted-merge into the sorted-unique accumulation —
pipeline/matrix.py) — must match a dense np.add.at oracle exactly: same
pixels in the same (row, col)-sorted order, same counts, including
out-of-bounds drops (XLA scatter parity), the symmetric diagonal-once
rule (reference matrixBuilding.py:588-592), directed weighted increments
(matrixBuilding.py:1295-1301), add_symmetric folding, and __add__
merges.  Small compact_every forces many merge rounds in the numpy
path; the ``backend`` fixture runs every test under both."""

import numpy as np
import pytest

from hichap_master_tpu.io.native import gw_accumulator
from hichap_master_tpu.pipeline.matrix import SparseDirectedGW, SparseGW

S = 997  # prime: no accidental alignment with key arithmetic


@pytest.fixture(params=["native", "numpy"], autouse=True)
def backend(request, monkeypatch):
    if request.param == "native":
        monkeypatch.setenv("HICHAP_NATIVE_GWACC", "1")
        if gw_accumulator() is None:
            pytest.skip("native hicio unavailable")
    else:
        monkeypatch.setenv("HICHAP_NATIVE_GWACC", "0")
    return request.param


def test_backend_selection(backend):
    acc = SparseGW(S)
    assert (acc._nat is not None) == (backend == "native")


def test_sparse_gw_matches_dense_oracle():
    rng = np.random.default_rng(11)
    acc = SparseGW(S, compact_every=5_000)
    dense = np.zeros((S, S))
    for _ in range(25):
        b1 = rng.integers(-7, S + 7, 3_000)
        b2 = rng.integers(-7, S + 7, 3_000)
        acc.add(b1, b2)
        ok = (b1 >= 0) & (b1 < S) & (b2 >= 0) & (b2 < S)
        lo = np.minimum(b1, b2)[ok]
        hi = np.maximum(b1, b2)[ok]
        np.add.at(dense, (lo, hi), 1)
    r, c, v = acc.coo()
    nz = dense.nonzero()
    assert np.array_equal(np.c_[r, c], np.transpose(nz))
    assert np.array_equal(v, dense[nz])
    # keys stay strictly sorted-unique after compaction
    assert np.all(np.diff(r.astype(np.int64) * S + c) > 0)


def test_sparse_directed_gw_weighted_and_add():
    rng = np.random.default_rng(13)
    parts = [SparseDirectedGW(S, compact_every=4_000) for _ in range(2)]
    dense = np.zeros((S, S))
    for d in parts:
        for _ in range(12):
            r = rng.integers(-7, S + 7, 2_000)
            c = rng.integers(-7, S + 7, 2_000)
            w = rng.random(2_000)
            d.add_directed(r, c, w)
            ok = (r >= 0) & (r < S) & (c >= 0) & (c < S)
            np.add.at(dense, (r[ok], c[ok]), w[ok])
        # unique upper-triangle block via add_symmetric
        a = rng.integers(0, S, 600)
        b = rng.integers(0, S, 600)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        k = lo.astype(np.int64) * S + hi
        _, ix = np.unique(k, return_index=True)
        lo, hi, v = lo[ix], hi[ix], rng.random(ix.size)
        d.add_symmetric(lo, hi, v)
        np.add.at(dense, (lo, hi), v)
        off = lo != hi
        np.add.at(dense, (hi[off], lo[off]), v[off])
    total = parts[0] + parts[1]
    r, c, v = total.coo()
    nz = dense.nonzero()
    assert np.array_equal(np.c_[r, c], np.transpose(nz))
    np.testing.assert_allclose(v, dense[nz], rtol=1e-12)
    assert total.sum() == pytest.approx(dense.sum())
    # builtin sum() with the 0 start
    assert np.allclose(sum([parts[0], parts[1]]).coo()[2], v)


def test_intra_acc_host_matches_device(backend, monkeypatch):
    """_IntraAcc host mode (hash or bincount fallback) == device scatter
    mode, both flavors (symmetric and single-side), incl. out-of-bounds
    drops.  The genome has one chromosome whose length is an exact
    multiple of the resolution (bin-count edge)."""
    from hichap_master_tpu.core import Genome
    from hichap_master_tpu.io.bedio import TAG_R1, TAG_R2
    from hichap_master_tpu.pipeline.matrix import _IntraAcc

    g = Genome({"1": 123_456, "2": 80_000, "X": 55_555})
    res = 10_000
    rng = np.random.default_rng(23)
    nc = len(g.labels)
    chunks = []
    for _ in range(4):
        c1 = rng.integers(0, nc, 5_000).astype(np.int32)
        c2 = np.where(rng.random(5_000) < 0.7, c1,
                      rng.integers(0, nc, 5_000)).astype(np.int32)
        sizes = np.array([g.sizes[c] for c in g.labels])
        # a few positions past the chromosome end probe the OOB drop
        p1 = (rng.random(5_000) * sizes[c1] * 1.01).astype(np.int64)
        p2 = (rng.random(5_000) * sizes[c2] * 1.01).astype(np.int64)
        tags = np.where(rng.random(5_000) < 0.5, TAG_R1, TAG_R2)
        chunks.append((c1, p1, c2, p2, tags))

    for single in (False, True):
        outs = []
        for mode in ("1", "0"):
            monkeypatch.setenv("HICHAP_HOST_INTRA", mode)
            acc = _IntraAcc(g, res, single_side=single)
            for c1, p1, c2, p2, tags in chunks:
                acc.add(c1, p1, c2, p2, tags=tags)
            outs.append(acc.finish())
        host, dev = outs
        assert set(host) == set(dev) == set(g.labels)
        for c in g.labels:
            np.testing.assert_array_equal(host[c], np.asarray(dev[c]),
                                          err_msg=f"{c} single={single}")


def test_export_memoization_invalidates_on_add(backend):
    """coo()/export() results are cached between adds (consumers call
    them repeatedly) and MUST reflect adds that come after an export."""
    acc = SparseGW(S)
    acc.add(np.array([3]), np.array([5]))
    r, c, v = acc.coo()
    assert (r.tolist(), c.tolist(), v.tolist()) == ([3], [5], [1.0])
    r2 = acc.coo()[0]
    assert r2.tolist() == [3]  # cached or recomputed — same content
    acc.add(np.array([1]), np.array([2]))
    r, c, v = acc.coo()
    assert r.tolist() == [1, 3] and c.tolist() == [2, 5]
    d = SparseDirectedGW(S)
    d.add_directed(np.array([9]), np.array([4]))
    assert d.sum() == 1.0
    _ = d.coo()
    d.add_symmetric(np.array([0]), np.array([1]), np.array([2.0]))
    r, c, v = d.coo()
    assert r.tolist() == [0, 1, 9] and v.tolist() == [2.0, 2.0, 1.0]


def test_compact_every_invariance():
    """The same stream compacted at different cadences is identical."""
    rng = np.random.default_rng(17)
    chunks = [(rng.integers(0, S, 1_500), rng.integers(0, S, 1_500))
              for _ in range(10)]
    outs = []
    for every in (1_000, 4_096, 1 << 24):
        acc = SparseGW(S, compact_every=every)
        for b1, b2 in chunks:
            acc.add(b1, b2)
        outs.append(acc.coo())
    for r, c, v in outs[1:]:
        assert np.array_equal(r, outs[0][0])
        assert np.array_equal(c, outs[0][1])
        assert np.array_equal(v, outs[0][2])
