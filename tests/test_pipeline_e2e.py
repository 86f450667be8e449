"""Hermetic end-to-end pipeline tests with the FakeAligner.

Covers the full diploid chain: genome rebuild → chunking → mapping →
junction rescue → re-mapping → pair resolution → HiC filtering → allelic
assignment → haplotype matrix construction, all without external binaries.
"""

import os

import numpy as np
import pytest

from hichap_master_tpu.core import Genome
from hichap_master_tpu.io import CoolerReader
from hichap_master_tpu.io.fasta import load_snps, read_fasta
from hichap_master_tpu.pipeline.bam_process import bam_extract
from hichap_master_tpu.pipeline.chunking import split_reads
from hichap_master_tpu.pipeline.enzyme import enzyme_handle, junction_info
from hichap_master_tpu.pipeline.filtering import allelic_filtering, hic_filtering
from hichap_master_tpu.pipeline.genome_rebuild import (
    rebuild_genome,
    snps_integration,
)
from hichap_master_tpu.pipeline.mapping import (
    FakeAligner,
    ws_mapping,
    ws_rescue_mapping,
)
from hichap_master_tpu.pipeline.matrix import haplotype_matrix_construction
from hichap_master_tpu.pipeline.rescue import cutting_reads_to_remapping
from hichap_master_tpu.testing.synthetic import diploid_dataset

READ_LEN = 40


def test_enzyme_junctions():
    site, cut = enzyme_handle("MboI")
    assert (site, cut) == ("GATC", (0, 0))
    jp, jm, pal = junction_info(site, cut)
    assert jp == "GATCGATC" and pal
    site, cut = enzyme_handle("HindIII")
    jp, jm, pal = junction_info(site, cut)
    assert jp == "AAGCTAGCTT" and pal
    site, cut = enzyme_handle("A-AGCTT")
    assert site == "AAGCTT" and cut == (1, -1)
    with pytest.raises(ValueError):
        enzyme_handle("XYZ")


def test_diploid_pipeline_end_to_end(tmp_path, rng):
    ws = tmp_path
    data = diploid_dataset(rng, str(ws / "data"), n_pairs=300, n_snps=50,
                           read_len=READ_LEN)

    # --- rebuildG ---------------------------------------------------------
    gdir = ws / "genome"
    gdir.mkdir()
    snp_npz = snps_integration(data["snps"], str(gdir))
    out = rebuild_genome(data["fasta"], snp_npz, "MboI", str(gdir))
    assert os.path.exists(out["genomeSize"])
    m_fa = read_fasta(out["Maternal"])
    p_fa = read_fasta(out["Paternal"])
    snps = load_snps(snp_npz)
    # maternal == reference at SNPs, paternal differs
    diff = 0
    for c, tbl in snps.items():
        for pos, m_alt, p_alt in zip(tbl["pos"], tbl["m_alt"], tbl["p_alt"]):
            assert chr(m_fa[c][pos - 1]) == m_alt
            assert chr(p_fa[c][pos - 1]) == p_alt
            diff += m_alt != p_alt
    assert diff > 0

    # --- rebuildF ---------------------------------------------------------
    chunks_dir = ws / "fastqchunks"
    c1 = split_reads(data["fq1"], str(chunks_dir), 120, 1)
    c2 = split_reads(data["fq2"], str(chunks_dir), 120, 2)
    assert sum(c1) == 300 and sum(c2) == 300
    assert len(c1) == 3

    # --- GlobalMapping (FakeAligner) --------------------------------------
    fake = FakeAligner()
    global_dir = ws / "Global_bams"
    ws_mapping(str(chunks_dir), str(global_dir),
               indexes=[out["Maternal"], out["Paternal"]], aligner=fake,
               jobs=1)
    sams = os.listdir(global_dir)
    assert any("Maternal" in f for f in sams)
    assert any("Paternal" in f for f in sams)

    # --- Rescue + ReMapping ------------------------------------------------
    rescue_dir = ws / "RescueFastq"
    cutting_reads_to_remapping(str(global_dir), str(rescue_dir), "MboI")
    fqs = [f for f in os.listdir(rescue_dir)]
    assert fqs, "rescue produced no fastqs"
    n_rescued = sum(
        sum(1 for line in open(os.path.join(rescue_dir, f)) if line[0] == "@")
        for f in fqs)
    assert n_rescued > 0, "junction reads should be rescued"

    remap_dir = ws / "ReMap_bams"
    ws_rescue_mapping(str(rescue_dir), str(remap_dir),
                      {"Maternal": out["Maternal"],
                       "Paternal": out["Paternal"]},
                      aligner=fake, jobs=1)

    # --- bamProcess --------------------------------------------------------
    bed_dir = ws / "UniqRawBed"
    report = bam_extract(str(global_dir), str(remap_dir), str(bed_dir),
                         [out["Maternal_fragments"],
                          out["Paternal_fragments"]],
                         snp_npz, allelic=True, read_len=READ_LEN)
    # per-genome blocks like the reference's separate Maternal/Paternal
    # Mapping Statics (a merged total double-counted every pair)
    assert set(report) == {"Maternal", "Paternal"}
    for tag in ("Maternal", "Paternal"):
        assert report[tag]["Unique_pairs"] > 50
        assert report[tag]["Total_pairs"] >= 150

    # --- filtering ----------------------------------------------------------
    filt_dir = ws / "Filtered_Bed"
    s_m = hic_filtering(str(bed_dir), str(filt_dir), "Maternal", clean=False)
    s_p = hic_filtering(str(bed_dir), str(filt_dir), "Paternal", clean=False)
    assert s_m["Valid"] > 50 and s_p["Valid"] > 50

    m_bed = next(str(filt_dir / f) for f in os.listdir(filt_dir)
                 if "Maternal_Valid" in f)
    p_bed = next(str(filt_dir / f) for f in os.listdir(filt_dir)
                 if "Paternal_Valid" in f)
    allelic_dir = ws / "Allelic_Bed"
    rep = allelic_filtering(m_bed, p_bed, str(allelic_dir))
    assert rep["Total_valid_pairs"] > 50
    # reads were sampled from the maternal haplotype: maternal assignments
    # must dominate paternal ones
    assert rep["Maternal_Allelic_pairs"] > rep["Paternal_Allelic_pairs"]
    beds = os.listdir(allelic_dir)
    for kind in ("Bi_Allelic", "M_M", "P_P", "M_P", "P_M"):
        assert any(f.endswith(f"{kind}.bed") for f in beds), kind

    # --- matrix -------------------------------------------------------------
    mat_dir = ws / "Matrix"
    outm = haplotype_matrix_construction(
        str(mat_dir), [str(allelic_dir)], out["genomeSize"],
        whole_res=[10_000], local_res=[5_000], imputation_region=50_000)
    files = next(iter(outm.values()))
    r = CoolerReader(files["imputated"], 10_000)
    assert r.chromnames == ["M1", "M2", "P1", "P2"]
    total = sum(r.matrix(c).sum() for c in r.chromnames)
    assert total > 0
    assert np.isfinite(r.matrix("M1")).all()
