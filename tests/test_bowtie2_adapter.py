"""Bowtie2Aligner adapter: the only untested external boundary
(HiCHap/mapping.py:74-78).  A stub binary exercises the arg plumbing and
the native external name-sort on any machine; the real-binary smoke runs
only where bowtie2/bowtie2-build exist (skip-if-missing)."""

import gzip
import os
import shutil
import stat
import subprocess

import pytest

from hichap_master_tpu.io.sam import read_sam
from hichap_master_tpu.pipeline.mapping import Bowtie2Aligner, FakeAligner

UNSORTED_SAM = """\
@HD\tVN:1.0\tSO:unsorted
@SQ\tSN:1\tLN:4000
zeta_1\t0\t1\t101\t42\t8M\t*\t0\t0\tACGTACGT\tIIIIIIII\tAS:i:0
alpha_2\t16\t1\t201\t42\t8M\t*\t0\t0\tACGTACGT\tIIIIIIII\tAS:i:-3
mid_1\t4\t*\t0\t0\t*\t*\t0\t0\tACGTACGT\tIIIIIIII
"""


def _write_fastq(path, reads):
    with gzip.open(path, "wt") as f:
        for name, seq in reads:
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


def test_map_chunk_with_stub_binary(tmp_path):
    stub = tmp_path / "bowtie2"
    sam_src = tmp_path / "payload.sam"
    sam_src.write_text(UNSORTED_SAM)
    stub.write_text(
        "#!/bin/sh\n"
        "# stub: copy the payload to the -S target\n"
        'while [ "$1" ]; do\n'
        '  if [ "$1" = "-S" ]; then out="$2"; fi\n'
        "  shift\n"
        "done\n"
        f'cp "{sam_src}" "$out"\n')
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)

    fq = tmp_path / "chunk_1.fastq.gz"
    _write_fastq(fq, [("r1_1", "ACGTACGT")])
    out = tmp_path / "out.sam"
    aligner = Bowtie2Aligner(bowtie2=str(stub))
    assert aligner.available()
    aligner.map_chunk("idx", str(fq), str(out))
    recs = list(read_sam(str(out)))
    assert [r.query_name for r in recs] == ["alpha_2", "mid_1", "zeta_1"]
    assert recs[0].tag_as == -3
    assert not os.path.exists(str(out) + ".unsorted")


_HAVE_BT2 = (shutil.which("bowtie2") is not None
             and shutil.which("bowtie2-build") is not None)


@pytest.mark.skipif(not _HAVE_BT2, reason="bowtie2 not installed")
def test_real_bowtie2_matches_fake_aligner(tmp_path, rng):
    """Adapter SAM must resolve to the same mapped loci as FakeAligner on
    unique exact-match reads (HiCHap/mapping.py:74-78 boundary)."""
    bases = "ACGT"
    seq = "".join(rng.choice(list(bases), 4000))
    fasta = tmp_path / "g.fa"
    fasta.write_text(">1\n" + "\n".join(seq[i:i + 60]
                                        for i in range(0, len(seq), 60)) + "\n")
    idx = str(tmp_path / "idx")
    subprocess.run(["bowtie2-build", "-q", str(fasta), idx], check=True,
                   capture_output=True)

    reads = [(f"r{k}_1", seq[p:p + 50])
             for k, p in enumerate(rng.choice(3500, 20, replace=False))]
    fq = tmp_path / "chunk_1.fastq.gz"
    _write_fastq(fq, reads)

    real = Bowtie2Aligner()
    real_sam = tmp_path / "real.sam"
    real.map_chunk(idx, str(fq), str(real_sam))

    fake = FakeAligner.from_fasta(str(fasta))
    fake_sam = tmp_path / "fake.sam"
    fake.map_chunk(str(fasta), str(fq), str(fake_sam))

    def loci(path):
        return {r.query_name: (r.reference_name, r.pos, r.flag & 16)
                for r in read_sam(path) if not r.is_unmapped}

    real_loci, fake_loci = loci(str(real_sam)), loci(str(fake_sam))
    shared = set(real_loci) & set(fake_loci)
    assert len(shared) >= 15  # bowtie2 may soft-drop a few edge reads
    for name in shared:
        assert real_loci[name] == fake_loci[name], name
