"""Binning / imputation / matrix-construction pipeline tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from hichap_master_tpu.core import Genome
from hichap_master_tpu.io import CoolerReader, list_resolutions
from hichap_master_tpu.ops.imputation import (
    disk_offsets,
    impute_inter_chunk,
    impute_inter_oracle,
)
from hichap_master_tpu.pipeline.matrix import (
    accumulate_genomewide,
    accumulate_intra,
    haplotype_matrix_construction,
    traditional_matrix_construction,
)
from hichap_master_tpu.testing.synthetic import (
    random_contacts,
    write_allelic_beds,
    write_valid_bed,
)


@pytest.fixture
def genome():
    return Genome({"1": 900_000, "2": 700_000, "X": 500_000})


def _oracle_genomewide(c1, p1, c2, p2, genome, res):
    offs = genome.bin_offsets(res)
    S = genome.total_bins(res)
    M = np.zeros((S, S))
    starts = np.array([offs[c][0] for c in genome.labels])
    for a, b, c, d in zip(c1, p1, c2, p2):
        b1 = b // res + starts[a]
        b2 = d // res + starts[c]
        M[b1, b2] += 1
        if b1 != b2:
            M[b2, b1] += 1
    return M


def test_bin_genomewide_matches_oracle(rng, genome):
    c1, p1, c2, p2 = random_contacts(rng, genome, 5000)
    res = 50_000
    got = accumulate_genomewide(c1, p1, c2, p2, genome, res)
    want = _oracle_genomewide(c1, p1, c2, p2, genome, res)
    np.testing.assert_array_equal(got, want)


def test_bin_intra_matches_oracle(rng, genome):
    c1, p1, c2, p2 = random_contacts(rng, genome, 4000)
    res = 20_000
    got = accumulate_intra(c1, p1, c2, p2, genome, res)
    for ci, c in enumerate(genome.labels):
        n = genome.n_bins(c, res)
        M = np.zeros((n, n))
        sel = (c1 == ci) & (c2 == ci)
        for a, b in zip(p1[sel] // res, p2[sel] // res):
            M[a, b] += 1
            if a != b:
                M[b, a] += 1
        np.testing.assert_array_equal(got[c], M)


def test_impute_vote_matches_oracle(rng):
    S, L = 200, 6
    U = rng.poisson(1.0, (S, S)).astype(np.float64)
    U = np.triu(U) + np.triu(U, 1).T
    K = 300
    rows = rng.integers(0, S, K)
    cs = rng.integers(0, S, K)
    cc = rng.integers(0, S, K)
    di, dj = disk_offsets(L)
    imp0 = np.zeros((S, S))
    want = impute_inter_oracle(imp0, U, rows, cs, cc, L, 2, 0.9)
    got = impute_inter_chunk(
        jnp.asarray(imp0), jnp.asarray(U), jnp.asarray(rows), jnp.asarray(cs),
        jnp.asarray(cc), jnp.ones(K, bool), jnp.asarray(di), jnp.asarray(dj),
        L, 2.0, 0.9)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_traditional_construction_end_to_end(tmp_path, rng, genome):
    genome.write(tmp_path / "genomeSize")
    rep = tmp_path / "rep1"
    rep.mkdir()
    c1, p1, c2, p2 = random_contacts(rng, genome, 6000)
    write_valid_bed(str(rep / "CellA_R1_Valid.bed"), genome, c1, p1, c2, p2, rng)

    out = traditional_matrix_construction(
        str(tmp_path), [str(rep)], str(tmp_path / "genomeSize"),
        whole_res=[100_000], local_res=[50_000])
    merged = out["merged"]
    assert list_resolutions(merged) == [50_000, 100_000]

    r = CoolerReader(merged, 100_000)
    assert r.chromnames == ["1", "2", "X"]
    # genome-wide group agrees with direct binning
    want = _oracle_genomewide(c1, p1, c2, p2, genome, 100_000)
    offs = genome.bin_offsets(100_000)
    for c in genome.labels:
        s, e = offs[c]
        nb = genome.cooler_n_bins(c, 100_000)
        np.testing.assert_array_equal(r.matrix(c), want[s : s + nb, s : s + nb])
    # weights present and usable
    assert r.has_weights
    w = r.bins_weight()
    assert np.isfinite(w[~np.isnan(w)]).all()
    # cis-only local group has weights too
    r2 = CoolerReader(merged, 50_000)
    assert r2.has_weights


def test_haplotype_construction_end_to_end(tmp_path, rng, genome):
    genome.write(tmp_path / "genomeSize")
    rep = tmp_path / "Allelic_Bed"
    write_allelic_beds(str(rep), "CellA_R1_", genome, rng, n=4000)

    out = haplotype_matrix_construction(
        str(tmp_path), [str(rep)], str(tmp_path / "genomeSize"),
        whole_res=[100_000], local_res=[50_000],
        imputation_region=300_000)
    files = out["CellA_R1_"]

    # traditional cooler: base chroms, balanced
    rt = CoolerReader(files["tradition"], 100_000)
    assert rt.chromnames == ["1", "2", "X"]
    assert rt.has_weights

    # unimputated: haplotype chroms, symmetric int counts
    ru = CoolerReader(files["unimputated"], 100_000)
    assert ru.chromnames == ["M1", "M2", "MX", "P1", "P2", "PX"]
    m = ru.matrix("M1")
    np.testing.assert_array_equal(m, m.T)

    # imputated: corrected floats, finite, same chrom set
    ri = CoolerReader(files["imputated"], 50_000)
    mi = ri.matrix("M1")
    assert np.isfinite(mi).all()
    assert (mi >= 0).all()
    # corrected mean matches raw haplotype mean (two-step rescale invariant)
    # (loose check: nonzero and same order of magnitude)
    raw = CoolerReader(files["unimputated"], 50_000).matrix("M1")
    assert mi.sum() > 0
    assert 0.1 < mi.sum() / max(raw.sum(), 1) < 10

    # gap npz loads with the reference's access pattern
    gaps = np.load(files["gap"], allow_pickle=True)
    lib = gaps["50000"][()]
    assert "M1" in lib and isinstance(lib["M1"], np.ndarray)


def test_haplotype_imputation_adds_contacts(tmp_path, rng, genome):
    """Single-side contacts must land in Imputated but not UnImputated."""
    genome.write(tmp_path / "genomeSize")
    rep = tmp_path / "beds"
    rep.mkdir()
    labels = genome.labels
    # dense M_M Both background on chr1 so votes pass, plus R1 singles
    lines = []
    for i in range(400):
        p1 = int(rng.integers(1, 890_000))
        p2 = int(rng.integers(1, 890_000))
        lines.append(f"1\t{p1}\t1\t{p2}\tBoth")
    for i in range(50):
        p1 = int(rng.integers(1, 890_000))
        p2 = int(rng.integers(1, 890_000))
        lines.append(f"1\t{p1}\t1\t{p2}\tR1")
    (rep / "T_Valid_M_M.bed").write_text("\n".join(lines) + "\n")
    for kind in ("Bi_Allelic", "M_P", "P_M"):
        (rep / f"T_Valid_{kind}.bed").write_text("1\t100\t2\t200\n")
    (rep / "T_Valid_P_P.bed").write_text("1\t100\t1\t200\tBoth\n")

    from hichap_master_tpu.pipeline.matrix import build_haplotype_datasets
    data = build_haplotype_datasets(str(rep), genome, [100_000], [],
                                    imputation_region=300_000)
    u = data["UnImputated_Whole"][100_000]
    im = data["Imputated_Whole"][100_000]
    assert im.sum() > u.sum()  # singles added
    assert u.sum() == pytest.approx(2 * 400 + 2 * 1 + 2 * 2, abs=450)


def test_bincount_and_scatter_paths_agree(monkeypatch):
    """The host-bincount fast path and the chunked device scatter path must
    produce identical matrices (same symmetric/diagonal semantics)."""
    from hichap_master_tpu.core import Genome
    from hichap_master_tpu.pipeline.matrix import (accumulate_genomewide,
                                                   accumulate_intra)

    rng = np.random.default_rng(7)
    g = Genome({"1": 900_000, "2": 700_000})
    n = 5000
    c1 = rng.integers(0, 2, n).astype(np.int32)
    c2 = np.where(rng.random(n) < 0.7, c1,
                  rng.integers(0, 2, n)).astype(np.int32)
    sizes = np.asarray([900_000, 700_000])
    p1 = (rng.random(n) * (sizes[c1] - 1)).astype(np.int64)
    p2 = np.where(rng.random(n) < 0.3, p1,
                  (rng.random(n) * (sizes[c2] - 1)).astype(np.int64))
    res = 100_000

    gw_h = accumulate_genomewide(c1, p1, c2, p2, g, res)
    intra_h = accumulate_intra(c1, p1, c2, p2, g, res)
    monkeypatch.setenv("HICHAP_HOST_BINCOUNT", "0")
    gw_d = accumulate_genomewide(c1, p1, c2, p2, g, res)
    intra_d = accumulate_intra(c1, p1, c2, p2, g, res)
    np.testing.assert_array_equal(gw_h, gw_d)
    assert set(intra_h) == set(intra_d)
    for c in intra_h:
        np.testing.assert_array_equal(intra_h[c], intra_d[c])


def test_haplotype_build_is_chunk_size_invariant(tmp_path, rng, genome,
                                                 monkeypatch):
    """The streaming ingestion (HICHAP_ALLELIC_CHUNK rows per block, bounded
    host memory) must give byte-identical matrices at any chunk size —
    including the dense-vs-host-bincount and single-side/vote stages."""
    from hichap_master_tpu.pipeline.matrix import build_haplotype_datasets
    from hichap_master_tpu.testing.synthetic import write_allelic_beds

    rep = tmp_path / "beds"
    write_allelic_beds(str(rep), "Cell_R1_", genome, rng, n=900)

    kw = dict(whole_res=[100_000], local_res=[100_000],
              imputation_region=1_000_000, imputation_min=1,
              imputation_ratio=0.5)
    base = build_haplotype_datasets(str(rep), genome, **kw)
    monkeypatch.setenv("HICHAP_ALLELIC_CHUNK", "7")
    tiny = build_haplotype_datasets(str(rep), genome, **kw)

    for key in ("Tradition_Whole", "UnImputated_Whole", "Imputated_Whole"):
        np.testing.assert_array_equal(base[key][100_000], tiny[key][100_000])
    for key in ("Tradition_Local", "UnImputated_Local", "Imputated_Local"):
        for c in base[key][100_000]:
            np.testing.assert_array_equal(base[key][100_000][c],
                                          tiny[key][100_000][c])
