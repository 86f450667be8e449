"""Minimal SAM alignment I/O (pysam replacement).

The reference consumes name-sorted BAMs through pysam
(HiCHap/bamProcess.py:735-768).  This framework's aligner adapters emit SAM
text (bowtie2's native output; gzip supported), which this module parses
into lightweight records; name-sorting happens in-memory or via chunked
external sort.  Only the fields the pipeline consumes are kept:
name, flag, reference, 1-based pos, mapq, sequence, qual, AS/XS tags.
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from typing import Iterator, List, Optional

from ..core.genome import strip_chr


@dataclass
class AlnRecord:
    query_name: str
    flag: int
    reference_name: Optional[str]  # None when unmapped
    pos: int                       # 0-based (pysam .pos parity)
    mapq: int
    seq: str
    qual: str
    tag_as: Optional[int] = None
    tag_xs: Optional[int] = None

    @property
    def is_unmapped(self) -> bool:
        return bool(self.flag & 4) or self.reference_name is None

    @property
    def query_length(self) -> int:
        return len(self.seq)

    def has_tag(self, tag: str) -> bool:
        return (self.tag_as if tag == "AS" else self.tag_xs) is not None

    def get_tag(self, tag: str) -> int:
        v = self.tag_as if tag == "AS" else self.tag_xs
        if v is None:
            raise KeyError(tag)
        return v


def _open(path, mode="rt"):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def parse_sam_line(line: str) -> Optional[AlnRecord]:
    if not line or line.startswith("@"):
        return None
    f = line.rstrip("\r\n").split("\t")  # CRLF SAM: see the scanners
    if len(f) < 11:
        return None
    flag = int(f[1])
    ref = None if f[2] == "*" else f[2]
    tag_as = tag_xs = None
    for t in f[11:]:
        if t.startswith("AS:i:"):
            tag_as = int(t[5:])
        elif t.startswith("XS:i:"):
            tag_xs = int(t[5:])
    return AlnRecord(
        query_name=f[0], flag=flag, reference_name=ref,
        pos=int(f[3]) - 1, mapq=int(f[4]), seq=f[9], qual=f[10],
        tag_as=tag_as, tag_xs=tag_xs)


def read_sam(path: str) -> Iterator[AlnRecord]:
    with _open(path) as f:
        for line in f:
            rec = parse_sam_line(line)
            if rec is not None:
                yield rec


def format_sam_line(r: AlnRecord) -> str:
    """One SAM body line (shared by write_sam and the BAM→SAM
    conversion; empty SEQ/QUAL emit '*' per spec — an empty column is
    malformed SAM)."""
    tags = []
    if r.tag_as is not None:
        tags.append(f"AS:i:{r.tag_as}")
    if r.tag_xs is not None:
        tags.append(f"XS:i:{r.tag_xs}")
    return "\t".join([
        r.query_name, str(r.flag), r.reference_name or "*",
        str(r.pos + 1), str(r.mapq), "*", "*", "0", "0",
        r.seq or "*", r.qual or "*"] + tags) + "\n"


def write_sam(path: str, records: List[AlnRecord],
              references: Optional[dict] = None) -> None:
    op = gzip.open if str(path).endswith(".gz") else open
    with op(path, "wt") as f:
        if references:
            for name, length in references.items():
                f.write(f"@SQ\tSN:{name}\tLN:{length}\n")
        for r in records:
            f.write(format_sam_line(r))


def read_alignments(path: str) -> Iterator[AlnRecord]:
    """SAM/BAM-agnostic alignment reader: BGZF BAM inputs (the reference's
    interchange format, bamProcess.py:735-768) parse through io/bam.py,
    everything else as SAM text."""
    if str(path).endswith(".bam"):
        from .bam import read_bam
        return read_bam(path)
    return read_sam(path)


_NATIVE_MERGE_MIN_BYTES = 32 << 20


def read_sam_sorted_by_name(paths: List[str]) -> List[AlnRecord]:
    """Merge several SAM/BAM files and name-sort (``samtools merge -n`` +
    sort parity for the group-by-name consumer).  Large inputs route
    through the native external-memory merge (native/hicio.cpp) so the
    Python string layer only sees the already-ordered stream; BAM members
    stream-convert to SAM text first (the native merge is line-based)."""
    import os
    import tempfile

    total = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
    if total >= _NATIVE_MERGE_MIN_BYTES:
        from .native import get_lib, sam_sort_merge

        if get_lib() is not None:
            tmpdir = os.path.dirname(os.path.abspath(paths[0]))
            converted = []
            text_paths = []
            for p in paths:
                if str(p).endswith(".bam"):
                    from .bam import bam_to_sam
                    # .tmp tail: the name must match no chunk-input pattern
                    # (.sam/.sam.gz/.bam), or a crash between conversion and
                    # the finally-cleanup would leave a file that re-runs
                    # rediscover as an input chunk and double-count.
                    t = p + ".as_sam.tmp"
                    bam_to_sam(p, t)
                    converted.append(t)
                    text_paths.append(t)
                else:
                    text_paths.append(p)
            # suffix must not look like a chunk input (.sam/.bam): a temp
            # left by a crash must never be re-discovered as data
            with tempfile.NamedTemporaryFile(
                    "w", suffix=".merge.tmp", delete=False, dir=tmpdir) as tf:
                merged = tf.name
            try:
                sam_sort_merge(text_paths, merged)
                return list(read_sam(merged))
            finally:
                os.unlink(merged)
                for t in converted:
                    os.unlink(t)

    records: List[AlnRecord] = []
    for p in paths:
        records.extend(read_alignments(p))
    records.sort(key=lambda r: r.query_name)
    return records
