"""Tests pinning deliberately-preserved reference quirks (SURVEY §2.4)."""

import math

import numpy as np

from hichap_master_tpu.models.loops import peaks_parameters
from hichap_master_tpu.ops.stats import lambda_chunks
from hichap_master_tpu.ops.imputation import disk_offsets


def test_disk_offsets_preserve_offcenter_quirk():
    """matrixBuilding.py:721-732: center at (L+1, L+1), radius sqrt(L)."""
    for L in (2, 5, 10, 20):
        di, dj = disk_offsets(L)
        want = []
        for i in range(2 * L + 1):
            for j in range(2 * L + 1):
                if math.sqrt((i - (L + 1)) ** 2 + (j - (L + 1)) ** 2) \
                        < math.sqrt(L):
                    want.append((i - L, j - L))
        got = sorted(zip(di.tolist(), dj.tolist()))
        assert got == sorted(want)
        # the quirk: the disk is NOT centred on (0, 0) — it skews +1/+1
        assert (np.mean(di) > 0) and (np.mean(dj) > 0)


def test_lambda_chunks_exclude_boundaries():
    """StructureFind.py:1619-1632: strict inequalities drop values exactly
    on the 2^(k/3) boundaries."""
    E = np.array([0.5, 1.0, 1.5, 2.0, 3.9, 4.0, 5.0])
    chunks = lambda_chunks(E)
    covered = np.concatenate([c[2] for c in chunks]) if chunks else []
    # values exactly at 1.0 and at 2^(3/3)=2.0 fall between chunks
    assert 1 not in covered and 3 not in covered and 5 not in covered
    assert 0 in covered and 2 in covered and 4 in covered
    # chunk edges follow 2^((i-1)/3)
    assert chunks[0][:2] == (0.0, 1.0)
    np.testing.assert_allclose(chunks[1][1], 2 ** (1 / 3))


def test_peaks_parameters_resolution_table():
    """StructureFind.py:1603-1617."""
    assert (peaks_parameters(40_000)["pw"], peaks_parameters(40_000)["ww"]) \
        == (1, 3)
    assert (peaks_parameters(10_000)["pw"], peaks_parameters(10_000)["ww"]) \
        == (2, 5)
    assert (peaks_parameters(5_000)["pw"], peaks_parameters(5_000)["ww"]) \
        == (4, 7)
    p = peaks_parameters(20_000)
    assert p["maxww"] == 20 and p["maxapart"] == 2_000_000 and p["sig"] == 0.05
