"""Legacy Select_PC parity (StructureFind.py:345-372), behind the
``selector='legacy'`` flag."""

import numpy as np

from hichap_master_tpu.models.compartment import (run_compartment,
                                                  select_pc_legacy)


def _reference_select_pc(cor, pcs):
    """Direct transcription of the reference's per-row corrcoef loop."""
    select_k, corr_coef, direction = 0, 0.0, 1
    for i in range(pcs.shape[0]):
        tmp = np.array([np.corrcoef(pcs[i], row)[0, 1] for row in cor])
        tmp[np.isnan(tmp)] = 0
        tmp[np.isinf(tmp)] = 1
        if np.abs(tmp).sum() > corr_coef:
            corr_coef = np.abs(tmp).sum()
            select_k = i
            direction = -1 if tmp.sum() < 0 else 1
    return pcs[select_k] * direction


def test_select_pc_legacy_matches_reference(rng):
    g = 60
    cor = rng.normal(size=(g, g))
    cor = (cor + cor.T) / 2
    cor[5] = 0.0  # constant row → nan corr → 0 in both paths
    cor[:, 5] = 0.0
    pcs = rng.normal(size=(3, g))
    got = select_pc_legacy(cor, pcs)
    want = _reference_select_pc(cor, pcs)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_run_compartment_legacy_selector(tmp_path, rng):
    from hichap_master_tpu.core import Genome
    from hichap_master_tpu.io import write_cooler

    n, res = 100, 100_000
    sign = np.where((np.arange(n) // 10) % 2 == 0, 1, -1)
    base = 2.0 + 0.8 * np.outer(sign, sign)
    d = np.abs(np.subtract.outer(np.arange(n), np.arange(n)))
    lam = base * 60 / (1 + d)
    M = rng.poisson(lam).astype(float)
    M = np.triu(M) + np.triu(M, 1).T
    g = Genome({"1": n * res - res // 2})
    path = str(tmp_path / "c.cool")
    write_cooler(path, g, res, {"1": M})

    tracks = run_compartment(path, res, False, str(tmp_path / "PCL"),
                             pca_method="eigh", selector="legacy")
    pc = tracks["1"]
    r = abs(np.corrcoef(pc, sign[: len(pc)])[0, 1])
    assert r > 0.8, f"legacy selector lost the signal: r={r}"

    import pytest
    with pytest.raises(ValueError, match="selector"):
        run_compartment(path, res, False, str(tmp_path / "PCX"),
                        selector="bogus")
