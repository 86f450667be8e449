"""Unit coverage: SAM roundtrip, FASTQ chunking, junction rescue, FASTA/SNPs."""

import gzip
import os

import numpy as np
import pytest

from hichap_master_tpu.io.fasta import (
    find_sites,
    load_snps,
    parse_snp_file,
    read_fasta,
    save_snps,
    write_fasta,
)
from hichap_master_tpu.io.sam import AlnRecord, read_sam, write_sam
from hichap_master_tpu.pipeline.chunking import split_reads
from hichap_master_tpu.pipeline.enzyme import enzyme_handle, junction_info
from hichap_master_tpu.pipeline.rescue import MIN_LEN, split_read


def test_sam_roundtrip(tmp_path):
    recs = [
        AlnRecord("r1_1", 0, "1", 99, 42, "ACGT", "IIII", tag_as=-3,
                  tag_xs=-9),
        AlnRecord("r1_2", 16, "2", 0, 42, "GGTT", "IIII", tag_as=0),
        AlnRecord("r2_1", 4, None, -1, 0, "TTTT", "IIII"),
    ]
    p = str(tmp_path / "t.sam")
    write_sam(p, recs, references={"1": 1000, "2": 500})
    back = list(read_sam(p))
    assert len(back) == 3
    assert back[0].pos == 99 and back[0].get_tag("AS") == -3
    assert back[0].get_tag("XS") == -9
    assert back[1].flag == 16 and not back[1].has_tag("XS")
    assert back[2].is_unmapped and back[2].reference_name is None


def test_fastq_chunking_tags_and_counts(tmp_path):
    fq = tmp_path / "cell_R1_1.fastq"
    with open(fq, "w") as f:
        for i in range(25):
            f.write(f"@read{i} extra\nACGT\n+\nIIII\n")
    counts = split_reads(str(fq), str(tmp_path / "chunks"), 10, 1)
    assert counts == [10, 10, 5]
    first = gzip.open(tmp_path / "chunks" / "cell_R1_chunk0_1.fastq.gz",
                      "rt").readline()
    assert first.startswith("@read0_1 ")
    with pytest.raises(IOError):
        bad = tmp_path / "bad_1.fastq"
        bad.write_text("not a fastq\n")
        split_reads(str(bad), str(tmp_path / "chunks2"), 10, 1)


def test_fastq_chunk_names_use_mate_parameter(tmp_path):
    """Chunk suffix comes from the MATE PARAMETER, never the filename's
    trailing token: _R1/_R2-style inputs broke the downstream
    ``_chunk{i}_{mate}`` pairing contract, and dot-separated names
    collided both mates onto one output file (round-3 review find)."""
    for fname, mate in (("cell_R1.fastq", 1), ("cell_R2.fastq", 2),
                        ("dotty.1.fastq", 1), ("dotty.2.fastq", 2)):
        fq = tmp_path / fname
        with open(fq, "w") as f:
            for i in range(3):
                f.write(f"@{fname}read{i}\nACGT\n+\nIIII\n")
        split_reads(str(fq), str(tmp_path / "chunks3"), 10, mate)
    names = sorted(os.listdir(tmp_path / "chunks3"))
    assert names == ["cell_chunk0_1.fastq.gz", "cell_chunk0_2.fastq.gz",
                     "dotty_chunk0_1.fastq.gz", "dotty_chunk0_2.fastq.gz"]
    # mate 1 was not overwritten by mate 2
    first = gzip.open(tmp_path / "chunks3" / "dotty_chunk0_1.fastq.gz",
                      "rt").readline()
    assert first.startswith("@dotty.1.fastqread0_1")


def test_junction_split_modes():
    site, cut = enzyme_handle("MboI")
    junc = junction_info(site, cut)  # GATCGATC
    pad = "A" * 20
    # one site, both flanks long → two sub-reads named name1/name2
    seq = pad + "GATCGATC" + "C" * 20
    out = split_read("r_1", seq, "I" * len(seq), junc)
    assert "@r_11\n" in out and "@r_12\n" in out
    assert out.split("\n")[1] == pad
    # one site, short left flank → single read, original name
    seq2 = "AAA" + "GATCGATC" + "C" * 20
    out2 = split_read("r_1", seq2, "I" * len(seq2), junc)
    assert out2.startswith("@r_1\n" + "C" * 20)
    # no site → dropped; two sites → confused, dropped
    assert split_read("r_1", pad, "I" * len(pad), junc) == ""
    seq3 = pad + "GATCGATC" + pad + "GATCGATC" + pad
    assert split_read("r_1", seq3, "I" * len(seq3), junc) == ""


def test_fasta_and_snp_roundtrip(tmp_path):
    fa = tmp_path / "g.fa"
    write_fasta(str(fa), {"1": np.frombuffer(b"ACGTGATCACGT", np.uint8)})
    back = read_fasta(str(fa))
    assert back["1"].tobytes() == b"ACGTGATCACGT"
    assert find_sites(back["1"], "GATC").tolist() == [4]
    # lowercase folds
    write_fasta(str(fa), {"1": np.frombuffer(b"acgtgatcacgt", np.uint8)})
    assert find_sites(read_fasta(str(fa))["1"], "GATC").tolist() == [4]

    snp_txt = tmp_path / "s.txt"
    snp_txt.write_text("1\t5\tG\tG\tA\nchr1\t2\tC\tC\tT\n")
    snps = parse_snp_file(str(snp_txt))
    assert snps["1"]["pos"].tolist() == [2, 5]  # insertion-sorted
    npz = str(tmp_path / "s.npz")
    save_snps(snps, npz)
    back = load_snps(npz)
    assert back["1"]["p_alt"].tolist() == ["T", "A"]
