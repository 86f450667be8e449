"""Sliding-approach O/E parity, allelic compartment path, plot MS modes."""

import numpy as np
import jax.numpy as jnp
import pytest

from hichap_master_tpu.core import Genome
from hichap_master_tpu.core.contacts import pad_to_bucket
from hichap_master_tpu.io import CoolerReader, write_cooler
from hichap_master_tpu.models.compartment import run_compartment
from hichap_master_tpu.ops.expected import (
    default_compartment_gap,
    distance_decay,
    oe_matrix_sliding,
)
from hichap_master_tpu.testing.oracles import synthetic_contact_matrix


def oracle_sliding(M, decline, step):
    """StructureFind.py:274-299."""
    N = M.shape[0]
    out = np.zeros_like(M, dtype=float)
    for i in range(N):
        for j in range(N):
            if i < step or j < step or i > N - step - 1 or j > N - step - 1:
                out[i, j] = M[i, j] / decline[abs(i - j)]
            else:
                o = M[i - step:i + step + 1, j - step:j + step + 1].sum()
                e = (3 * decline[abs(i - j)] + 2 * decline[abs(i - j - 1)]
                     + 2 * decline[abs(i - j + 1)] + decline[abs(i - j - 2)]
                     + decline[abs(i - j + 2)])
                out[i, j] = o / e
    return out


def test_sliding_oe_matches_oracle(rng):
    n, step = 60, 1
    M = synthetic_contact_matrix(rng, n, gap_frac=0.0, scale=30.0)
    N = pad_to_bucket(n)
    Mp = np.zeros((N, N)); Mp[:n, :n] = M
    Mj = jnp.asarray(Mp)
    gap = default_compartment_gap(Mj, jnp.asarray(n))
    dec = distance_decay(Mj, gap, jnp.asarray(n))
    got = np.asarray(oe_matrix_sliding(Mj, dec, jnp.asarray(n), step))[:n, :n]
    decline = np.asarray(dec)[:n].copy()
    decline[decline == 0] = decline[np.nonzero(decline)].min()
    want = oracle_sliding(M, decline, step)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def _hap_cooler_with_signal(tmp_path, rng, n=80, res=100_000):
    g = Genome({"1": n * res - res // 2})
    hap = g.haplotype()
    sign = np.where((np.arange(n) // 8) % 2 == 0, 1, -1)
    base = 2.0 + 0.8 * np.outer(sign, sign)
    d = np.abs(np.subtract.outer(np.arange(n), np.arange(n)))
    lam = base * 50 / (1 + d)
    mats = {}
    for c in hap.labels:
        M = rng.poisson(lam).astype(float)
        mats[c] = np.triu(M) + np.triu(M, 1).T
    path = str(tmp_path / "hap.cool")
    write_cooler(path, hap, res, mats)
    # traditional cooler for the supervised PC
    tpath = str(tmp_path / "trad.cool")
    M = rng.poisson(lam * 2).astype(float)
    write_cooler(tpath, g, res, {"1": np.triu(M) + np.triu(M, 1).T})
    return path, tpath, res, sign


def test_allelic_compartment_supervised(tmp_path, rng):
    hap_path, trad_path, res, sign = _hap_cooler_with_signal(tmp_path, rng)
    trad = run_compartment(trad_path, res, False, str(tmp_path / "T"),
                           pca_method="eigh")
    pc_file = str(tmp_path / "T" / "T_Compartment_100K.txt")
    m_tracks = run_compartment(hap_path, res, "Maternal",
                               str(tmp_path / "M"),
                               traditional_pc_file=pc_file,
                               pca_method="eigh")
    assert "M1" in m_tracks
    nb = len(m_tracks["M1"])
    r = abs(np.corrcoef(m_tracks["M1"], sign[:nb])[0, 1])
    assert r > 0.7, f"allelic PC uncorrelated with truth: {r}"
    # output file strips the haplotype prefix
    out = (tmp_path / "M" / "M_Compartment_100K.txt").read_text()
    assert out.splitlines()[0].split("\t")[0] == "1"
    # missing traditional PC → clear error
    with pytest.raises(ValueError, match="traditional PC"):
        run_compartment(hap_path, res, "Paternal", str(tmp_path / "P"))


def test_plot_ms_modes(tmp_path, rng):
    hap_path, trad_path, res, _ = _hap_cooler_with_signal(tmp_path, rng)
    for ms in ("IF", "OE", "Cor"):
        run_compartment(trad_path, res, False, str(tmp_path / f"P{ms}"),
                        pca_method="eigh", plot=True, ms=ms)
        assert (tmp_path / f"P{ms}" /
                f"P{ms}_Compartment_{ms}_100K.pdf").exists()
