"""BGZF BAM ingestion (io/bam.py): round trip, spec compliance, and
SAM-path equivalence through the pipeline's pair integration
(the reference's pysam boundary, bamProcess.py:735-768)."""

import gzip
import struct

import numpy as np
import pytest

from hichap_master_tpu.io.bam import (BGZF_EOF, bam_to_sam, read_bam,
                                      write_bam)
from hichap_master_tpu.io.sam import (AlnRecord, read_alignments, read_sam,
                                      read_sam_sorted_by_name, write_sam)
from hichap_master_tpu.pipeline.bam_process import get_chunks, integrate_chunk


def _records():
    return [
        AlnRecord("r1_1", 0, "1", 150, 42, "ACGTACGTAC", "IIIIIIIIII",
                  tag_as=0),
        AlnRecord("r1_2", 16, "2", 2100, 42, "TTTTGGGGCC", "HHHHHHHHHH",
                  tag_as=-3, tag_xs=-11),
        AlnRecord("r2_1", 4, None, -1, 0, "ACACACACAC", "IIIIIIIIII"),
        AlnRecord("r2_2", 0, "1", 990, 42, "GGGGGGGGGG", "IIIIIIIIII",
                  tag_as=0),
    ]


REFS = {"1": 5000, "2": 5000}


def test_bam_round_trip(tmp_path):
    path = str(tmp_path / "a.bam")
    write_bam(path, _records(), REFS)
    got = list(read_bam(path))
    assert got == _records()
    # read_alignments dispatches on extension
    assert list(read_alignments(path)) == _records()


def test_bgzf_spec_compliance(tmp_path):
    """Every member is a gzip block with the BC extra subfield, the stream
    ends with the canonical EOF marker, and blocks stay < 64 KiB."""
    path = str(tmp_path / "a.bam")
    # enough records to force multiple blocks
    recs = [AlnRecord(f"q{k}_1", 0, "1", k, 42, "A" * 100, "I" * 100,
                      tag_as=0) for k in range(3000)]
    write_bam(path, recs, REFS)
    raw = open(path, "rb").read()
    assert raw.endswith(BGZF_EOF)
    off, blocks = 0, 0
    while off < len(raw):
        assert raw[off:off + 4] == b"\x1f\x8b\x08\x04"
        xlen = struct.unpack_from("<H", raw, off + 10)[0]
        extra = raw[off + 12:off + 12 + xlen]
        assert extra[:4] == b"BC\x02\x00"
        bsize = struct.unpack_from("<H", extra, 4)[0] + 1
        assert bsize <= 65536
        off += bsize
        blocks += 1
    assert off == len(raw) and blocks >= 3
    assert [r.query_name for r in read_bam(path)] == \
        [r.query_name for r in recs]


def test_bam_feeds_pairs_identically_to_sam(tmp_path):
    """integrate_chunk over BAM chunk files must produce byte-identical
    bed output to the same alignments as SAM text."""
    frag = tmp_path / "frags.txt"
    frag.write_text("1\t1\t1000\n1\t1000\t2000\n1\t2000\t3000\n"
                    "2\t1\t2500\n2\t2500\t5000\n")
    aln = {
        "g1": [AlnRecord("p1_1", 0, "1", 150, 42, "A" * 50, "I" * 50,
                         tag_as=0),
               AlnRecord("p2_1", 0, "1", 2100, 42, "A" * 50, "I" * 50,
                         tag_as=0)],
        "g2": [AlnRecord("p1_2", 16, "2", 2600, 42, "A" * 50, "I" * 50,
                         tag_as=0),
               AlnRecord("p2_2", 16, "1", 120, 42, "A" * 50, "I" * 50,
                         tag_as=0)],
        "r1": [], "r2": [],
    }
    sam_files, bam_files = [], []
    for key, recs in aln.items():
        sp = str(tmp_path / f"{key}.sam")
        bp = str(tmp_path / f"{key}.bam")
        write_sam(sp, recs)
        write_bam(bp, recs, REFS)
        sam_files.append(sp)
        bam_files.append(bp)

    bed_sam = str(tmp_path / "out_sam.bed")
    bed_bam = str(tmp_path / "out_bam.bed")
    s1 = integrate_chunk(sam_files, bed_sam, str(frag), None, "", 1)
    s2 = integrate_chunk(bam_files, bed_bam, str(frag), None, "", 1)
    assert s1 == s2
    assert open(bed_sam).read() == open(bed_bam).read()
    assert open(bed_sam).read().count("\n") == 2


def test_bam_to_sam_stream(tmp_path):
    bam = str(tmp_path / "a.bam")
    sam = str(tmp_path / "a.sam")
    write_bam(bam, _records(), REFS)
    bam_to_sam(bam, sam)
    assert list(read_sam(sam)) == _records()


def test_native_merge_path_handles_bam(tmp_path, monkeypatch):
    """Force the external-merge route and mix SAM + BAM inputs."""
    import hichap_master_tpu.io.sam as sam_mod

    monkeypatch.setattr(sam_mod, "_NATIVE_MERGE_MIN_BYTES", 0)
    recs = _records()
    sp = str(tmp_path / "x.sam")
    bp = str(tmp_path / "y.bam")
    write_sam(sp, recs[:2])
    write_bam(bp, recs[2:], REFS)
    merged = read_sam_sorted_by_name([sp, bp])
    assert [r.query_name for r in merged] == sorted(
        r.query_name for r in recs)
    import os
    assert not [f for f in os.listdir(tmp_path) if "as_sam" in f]


def test_get_chunks_discovers_bam(tmp_path):
    (tmp_path / "cell_chunk0_1.bam").write_bytes(b"")
    (tmp_path / "cell_chunk0_2.bam").write_bytes(b"")
    chunks, n, cell = get_chunks(str(tmp_path))
    assert n == 1 and cell == "cell" and len(chunks) == 2


def test_write_bam_record_larger_than_bgzf_block(tmp_path):
    """A single record above the 64 KiB BGZF payload cap must span blocks
    (BGZF blocks cap the stream, not records)."""
    import numpy as np

    rng = np.random.default_rng(0)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 80_000))
    qual = "".join(chr(33 + int(q)) for q in rng.integers(0, 40, 80_000))
    big = AlnRecord(query_name="huge_1", flag=0, reference_name="1",
                    pos=100, mapq=42, seq=seq, qual=qual, tag_as=-3,
                    tag_xs=None)
    small = AlnRecord(query_name="tiny_2", flag=16, reference_name="2",
                      pos=5, mapq=30, seq="ACGT", qual="IIII", tag_as=0,
                      tag_xs=-7)
    path = str(tmp_path / "big.bam")
    write_bam(path, [big, small], REFS)
    back = list(read_bam(path))
    assert [r.query_name for r in back] == ["huge_1", "tiny_2"]
    assert back[0].seq == seq and back[0].qual == qual
    assert back[1].reference_name == "2" and back[1].tag_xs == -7
