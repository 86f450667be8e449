"""Traditional (non-allelic) pipeline end-to-end with the FakeAligner."""

import os

import numpy as np

from hichap_master_tpu.io import CoolerReader, list_resolutions
from hichap_master_tpu.pipeline.bam_process import bam_extract
from hichap_master_tpu.pipeline.chunking import split_reads
from hichap_master_tpu.pipeline.filtering import hic_filtering
from hichap_master_tpu.pipeline.genome_rebuild import build_raw_genome
from hichap_master_tpu.pipeline.mapping import (
    FakeAligner,
    ws_mapping,
    ws_rescue_mapping,
)
from hichap_master_tpu.pipeline.matrix import traditional_matrix_construction
from hichap_master_tpu.pipeline.rescue import cutting_reads_to_remapping
from hichap_master_tpu.testing.synthetic import diploid_dataset

READ_LEN = 40


def test_nonallelic_pipeline_end_to_end(tmp_path, rng):
    data = diploid_dataset(rng, str(tmp_path / "data"), n_pairs=200,
                           n_snps=0, read_len=READ_LEN)
    gdir = tmp_path / "genome"
    gdir.mkdir()
    out = build_raw_genome(data["fasta"], "MboI", str(gdir))
    assert os.path.exists(out["fragments"])

    chunks_dir = tmp_path / "chunks"
    split_reads(data["fq1"], str(chunks_dir), 150, 1)
    split_reads(data["fq2"], str(chunks_dir), 150, 2)

    fake = FakeAligner()
    gdirm = tmp_path / "Global_bams"
    ws_mapping(str(chunks_dir), str(gdirm), indexes=[data["fasta"]],
               aligner=fake, jobs=1)
    rdir = tmp_path / "RescueFastq"
    cutting_reads_to_remapping(str(gdirm), str(rdir), "MboI")
    mdir = tmp_path / "ReMap_bams"
    ws_rescue_mapping(str(rdir), str(mdir), {"": data["fasta"]},
                      aligner=fake, jobs=1)

    bed_dir = tmp_path / "UniqRawBed"
    report = bam_extract(str(gdirm), str(mdir), str(bed_dir),
                         [out["fragments"]], None, allelic=False,
                         read_len=READ_LEN)
    assert report["Unique_pairs"] > 100

    filt = tmp_path / "Filtered_Bed"
    stats = hic_filtering(str(bed_dir), str(filt), "NonAllelic", clean=False)
    assert stats["Valid"] > 50

    mat = tmp_path / "Matrix"
    res = traditional_matrix_construction(
        str(mat), [str(filt)], out["genomeSize"],
        whole_res=[10_000], local_res=[5_000])
    merged = res["merged"]
    assert sorted(list_resolutions(merged)) == [5_000, 10_000]
    r = CoolerReader(merged, 10_000)
    assert r.has_weights
    total = sum(r.matrix(c).sum() for c in r.chromnames)
    assert total > 0
