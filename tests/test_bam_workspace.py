"""BAM workspace format: ``--bam-format`` stores mapped chunks as BGZF
``.bam`` files — the reference's workspace contract (bamProcess.py:730,
written by its bowtie2|samtools pipe, mapping.py:74-78) — and every
downstream consumer (rescue, bamProcess) reads them identically to SAM."""

import gzip
import os

from hichap_master_tpu.io.bam import read_bam, sam_to_bam
from hichap_master_tpu.io.sam import AlnRecord, read_sam, write_sam
from hichap_master_tpu.pipeline.bam_process import get_chunks
from hichap_master_tpu.pipeline.mapping import (FakeAligner, ws_mapping,
                                                ws_rescue_mapping)

GENOME = {
    "1": "ACGTACGTAAGCTTGGCCAATTGGCCAATTACGTACGTACGTACGTACGT" * 8,
    "2": "TTGGCCAACCGGTTAAGCTTACCGGTACCGGTTCAGATCAGATCAGATCG" * 8,
}


def _write_chunk_fq(path, reads):
    with gzip.open(path, "wt") as f:
        for name, seq in reads:
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


def _mk_chunks(d):
    os.makedirs(d, exist_ok=True)
    reads = [("a_1", GENOME["1"][10:40]), ("b_1", GENOME["2"][55:85]),
             ("c_1", "T" * 30)]  # c is unmapped
    _write_chunk_fq(os.path.join(d, "cell_chunk0_1.fastq.gz"), reads)


def test_ws_mapping_bam_format_matches_sam(tmp_path):
    fq = tmp_path / "chunks"
    _mk_chunks(str(fq))
    al = FakeAligner(GENOME)

    sam_dir = str(tmp_path / "sam_out")
    bam_dir = str(tmp_path / "bam_out")
    sam_outs = ws_mapping(str(fq), sam_dir, ["idx"], aligner=al, jobs=1,
                          index_tags=("T",))
    bam_outs = ws_mapping(str(fq), bam_dir, ["idx"], aligner=al, jobs=1,
                          index_tags=("T",), out_format="bam")

    assert [os.path.basename(p) for p in bam_outs] == ["cell_chunk0_1_T.bam"]
    assert os.path.exists(bam_outs[0])
    # no leftover SAM text or temp files in the BAM workspace
    assert sorted(os.listdir(bam_dir)) == ["cell_chunk0_1_T.bam"]
    got = list(read_bam(bam_outs[0]))
    want = list(read_sam(sam_outs[0]))
    assert got == want
    # the BGZF stream is plain multi-member gzip → standard tools can read
    raw = gzip.open(bam_outs[0], "rb").read(4)
    assert raw == b"BAM\x01"


def test_bam_chunks_discovered_by_bam_process(tmp_path):
    fq = tmp_path / "chunks"
    _mk_chunks(str(fq))
    out = str(tmp_path / "Global_bams")
    ws_mapping(str(fq), out, ["idx"], aligner=FakeAligner(GENOME), jobs=1,
               index_tags=("Maternal",), out_format="bam")
    files, n, cell = get_chunks(out)
    assert n == 1 and files and files[0].endswith(".bam")
    assert cell == "cell"


def test_ws_rescue_mapping_bam_format(tmp_path):
    rescue = tmp_path / "rescue"
    rescue.mkdir()
    with open(rescue / "cell_chunk0_1_unmapped.fq", "w") as f:
        f.write(f"@r_1\n{GENOME['1'][20:50]}\n+\n{'I' * 30}\n")
    out = str(tmp_path / "ReMap_bams")
    outs = ws_rescue_mapping(str(rescue), out, {"": "idx"},
                             aligner=FakeAligner(GENOME), jobs=1,
                             out_format="bam")
    assert outs and outs[0].endswith(".bam") and os.path.exists(outs[0])
    recs = list(read_bam(outs[0]))
    assert len(recs) == 1 and recs[0].reference_name == "1"


def test_sam_to_bam_header_fallbacks(tmp_path):
    """@SQ lengths win when present; otherwise lengths are the observed
    max(pos+len(seq)) lower bound from a record scan."""
    recs = [AlnRecord("q_1", 0, "1", 100, 42, "A" * 20, "I" * 20, tag_as=0),
            AlnRecord("q_2", 4, None, -1, 0, "C" * 20, "I" * 20)]
    with_hdr = str(tmp_path / "h.sam")
    write_sam(with_hdr, recs, references={"1": 9999})
    bam1 = str(tmp_path / "h.bam")
    sam_to_bam(with_hdr, bam1)

    headerless = str(tmp_path / "n.sam")
    write_sam(headerless, recs)
    bam2 = str(tmp_path / "n.bam")
    sam_to_bam(headerless, bam2)

    import struct

    def _ref_len(path):
        with gzip.open(path, "rb") as f:
            assert f.read(4) == b"BAM\x01"
            (l_text,) = struct.unpack("<i", f.read(4))
            f.read(l_text)
            (n_ref,) = struct.unpack("<i", f.read(4))
            assert n_ref == 1
            (l_name,) = struct.unpack("<i", f.read(4))
            f.read(l_name)
            (l_ref,) = struct.unpack("<i", f.read(4))
            return l_ref

    # headerless, two mapped records, the LATER one rightmost: the scan
    # must keep accumulating max(pos+len) for references it sized itself
    # (only @SQ-derived lengths may short-circuit the parse — review find)
    multi = [AlnRecord("a_1", 0, "1", 100, 42, "A" * 20, "I" * 20, tag_as=0),
             AlnRecord("b_1", 0, "1", 500, 42, "G" * 20, "I" * 20, tag_as=0)]
    hl2 = str(tmp_path / "hl2.sam")
    write_sam(hl2, multi)
    bam3 = str(tmp_path / "hl2.bam")
    sam_to_bam(hl2, bam3)
    assert _ref_len(bam3) == 520

    for path, want_len in ((bam1, 9999), (bam2, 120)):
        with gzip.open(path, "rb") as f:
            assert f.read(4) == b"BAM\x01"
            (l_text,) = struct.unpack("<i", f.read(4))
            text = f.read(l_text).decode()
            assert "SO:queryname" in text
            (n_ref,) = struct.unpack("<i", f.read(4))
            assert n_ref == 1
            (l_name,) = struct.unpack("<i", f.read(4))
            assert f.read(l_name)[:-1] == b"1"
            (l_ref,) = struct.unpack("<i", f.read(4))
            assert l_ref == want_len
        assert list(read_bam(path)) == recs
