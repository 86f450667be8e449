"""BAM (BGZF) alignment I/O — dependency-free pysam replacement.

The reference consumes name-sorted BAMs through pysam
(HiCHap/bamProcess.py:735-768) and expects users to resume mid-pipeline
from existing BAM data (scripts/hichap:317-343).  BGZF is a sequence of
standard gzip members (RFC 1952 with a BC extra subfield carrying the
block size), so Python's multi-member ``gzip`` module decompresses it
directly; this module parses the binary BAM payload into the same
``AlnRecord``s the SAM reader produces — only the fields the pipeline
consumes (name, flag, reference, 0-based pos, mapq, seq, qual, AS/XS).

``write_bam`` emits spec-compliant BGZF (≤64 KiB blocks + the canonical
28-byte EOF marker) for fixtures and interchange.
"""

from __future__ import annotations

import gzip
import struct
import zlib
from typing import Dict, Iterable, Iterator, List, Optional, Tuple

from .sam import AlnRecord

_SEQ_CODES = "=ACMGRSVTWYHKDBN"
_CIGAR_OPS = "MIDNSHP=X"

# canonical BGZF end-of-file marker (SAM spec §4.1.2)
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


# ------------------------------------------------------------------ read
def _read_exact(f, n: int) -> bytes:
    buf = f.read(n)
    if len(buf) != n:
        raise EOFError(f"truncated BAM: wanted {n} bytes, got {len(buf)}")
    return buf


def _parse_tags(buf: bytes) -> Tuple[Optional[int], Optional[int]]:
    """Scan the auxiliary block for AS/XS integer tags."""
    tag_as = tag_xs = None
    i = 0
    n = len(buf)
    int_fmt = {"c": ("<b", 1), "C": ("<B", 1), "s": ("<h", 2),
               "S": ("<H", 2), "i": ("<i", 4), "I": ("<I", 4)}
    while i + 3 <= n:
        tag = buf[i:i + 2].decode("ascii", "replace")
        typ = chr(buf[i + 2])
        i += 3
        if typ in int_fmt:
            fmt, sz = int_fmt[typ]
            val = struct.unpack_from(fmt, buf, i)[0]
            i += sz
            if tag == "AS":
                tag_as = int(val)
            elif tag == "XS":
                tag_xs = int(val)
        elif typ == "A":
            i += 1
        elif typ == "f":
            i += 4
        elif typ in ("Z", "H"):
            end = buf.index(b"\x00", i)
            i = end + 1
        elif typ == "B":
            sub = chr(buf[i])
            # count is uint32 per the BAM spec; a signed read of a corrupt
            # count could walk i backwards instead of failing cleanly
            cnt = struct.unpack_from("<I", buf, i + 1)[0]
            elt = {"c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}[sub]
            i += 5 + cnt * elt
            if i > n:  # truncated/corrupt array: stop scanning
                break
        else:  # unknown type: cannot skip safely
            break
    return tag_as, tag_xs


def read_bam_header(f) -> List[str]:
    """Parse magic + text + reference list; returns reference names."""
    if _read_exact(f, 4) != b"BAM\x01":
        raise ValueError("not a BAM stream (bad magic)")
    (l_text,) = struct.unpack("<i", _read_exact(f, 4))
    _read_exact(f, l_text)
    (n_ref,) = struct.unpack("<i", _read_exact(f, 4))
    refs = []
    for _ in range(n_ref):
        (l_name,) = struct.unpack("<i", _read_exact(f, 4))
        name = _read_exact(f, l_name)[:-1].decode()
        _read_exact(f, 4)  # l_ref
        refs.append(name)
    return refs


def read_bam(path: str) -> Iterator[AlnRecord]:
    """Stream alignments from a BGZF BAM file (pysam fetch parity for the
    fields the pipeline uses; bamProcess.py:735-768)."""
    with gzip.open(path, "rb") as f:
        refs = read_bam_header(f)
        while True:
            head = f.read(4)
            if not head:
                break
            if len(head) != 4:
                raise EOFError("truncated BAM record header")
            (block_size,) = struct.unpack("<i", head)
            rec = _read_exact(f, block_size)
            (ref_id, pos, l_read_name, mapq, _bin, n_cigar, flag,
             l_seq, _next_ref, _next_pos, _tlen) = struct.unpack_from(
                "<iiBBHHHiiii", rec, 0)
            off = 32
            name = rec[off:off + l_read_name - 1].decode()
            off += l_read_name
            off += 4 * n_cigar
            nybbles = rec[off:off + (l_seq + 1) // 2]
            off += (l_seq + 1) // 2
            seq = "".join(
                _SEQ_CODES[(b >> 4) if k % 2 == 0 else (b & 0xF)]
                for k, b in ((k, nybbles[k // 2]) for k in range(l_seq)))
            qual_raw = rec[off:off + l_seq]
            off += l_seq
            qual = ("*" if l_seq and qual_raw[:1] == b"\xff"
                    else "".join(chr(q + 33) for q in qual_raw))
            tag_as, tag_xs = _parse_tags(rec[off:])
            ref = refs[ref_id] if 0 <= ref_id < len(refs) else None
            yield AlnRecord(query_name=name, flag=flag, reference_name=ref,
                            pos=pos, mapq=mapq, seq=seq, qual=qual,
                            tag_as=tag_as, tag_xs=tag_xs)


# ----------------------------------------------------------------- write
def _bgzf_block(payload: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = co.compress(payload) + co.flush()
    total = 18 + len(comp) + 8
    head = (b"\x1f\x8b\x08\x04" + b"\x00" * 6
            + struct.pack("<H", 6) + b"BC" + struct.pack("<H", 2)
            + struct.pack("<H", total - 1))
    return (head + comp + struct.pack("<I", zlib.crc32(payload))
            + struct.pack("<I", len(payload) & 0xFFFFFFFF))


def _encode_record(r: AlnRecord, ref_index: Dict[str, int]) -> bytes:
    if r.reference_name is None:
        ref_id = -1
    else:
        # silently writing -1 here would round-trip a MAPPED record into
        # an unmapped-looking one; a header/record mismatch is caller error
        ref_id = ref_index[r.reference_name]
    name = r.query_name.encode() + b"\x00"
    l_seq = len(r.seq)
    nyb = bytearray((l_seq + 1) // 2)
    for k, base in enumerate(r.seq):
        code = _SEQ_CODES.index(base) if base in _SEQ_CODES else 15
        if k % 2 == 0:
            nyb[k // 2] |= code << 4
        else:
            nyb[k // 2] |= code
    qual = (b"\xff" * l_seq if r.qual in ("*", "")
            else bytes((ord(c) - 33) & 0xFF for c in r.qual))
    tags = b""
    if r.tag_as is not None:
        tags += b"ASi" + struct.pack("<i", r.tag_as)
    if r.tag_xs is not None:
        tags += b"XSi" + struct.pack("<i", r.tag_xs)
    body = (struct.pack("<iiBBHHHiiii", ref_id, r.pos, len(name), r.mapq,
                        0, 0, r.flag, l_seq, -1, -1, 0)
            + name + bytes(nyb) + qual + tags)
    return struct.pack("<i", len(body)) + body


def write_bam(path: str, records: Iterable[AlnRecord],
              references: Dict[str, int],
              header_text: str = "") -> None:
    """Spec-compliant BGZF BAM writer (fixtures / interchange).

    ``records`` may be any iterable (it is consumed once, so chunk-sized
    streams never materialize); ``header_text`` is an optional SAM text
    header (e.g. ``@HD\\tVN:1.6\\tSO:queryname\\n``) embedded verbatim."""
    ref_index = {name: i for i, name in enumerate(references)}
    text = header_text.encode()
    header = (b"BAM\x01" + struct.pack("<i", len(text)) + text
              + struct.pack("<i", len(references)))
    for name, length in references.items():
        nb = name.encode() + b"\x00"
        header += struct.pack("<i", len(nb)) + nb + struct.pack("<i", length)

    # BGZF caps each block's UNCOMPRESSED payload at 64 KiB, but a BAM
    # record may legally span blocks — slice the byte stream at a fixed
    # payload size regardless of record boundaries (a single >64 KiB
    # record previously overflowed the block and crashed struct.pack).
    _PAYLOAD = 60_000
    buf = bytearray(header)
    with open(path, "wb") as f:
        for r in records:
            buf += _encode_record(r, ref_index)
            while len(buf) >= _PAYLOAD:
                f.write(_bgzf_block(bytes(buf[:_PAYLOAD])))
                del buf[:_PAYLOAD]
        if buf:
            f.write(_bgzf_block(bytes(buf)))
        f.write(BGZF_EOF)


def sam_to_bam(sam_path: str, bam_path: str,
               references: Optional[Dict[str, int]] = None) -> None:
    """Streaming SAM text → BGZF BAM conversion.

    Closes the reference's workspace contract of storing ``.bam`` chunk
    files (HiCHap/bamProcess.py:730, written by its samtools pipe at
    mapping.py:74-78) without a samtools dependency.  Reference lengths
    come from, in priority order: the ``references`` argument, the SAM's
    ``@SQ`` header lines, or — since the name-sorted chunks our aligner
    adapters emit are headerless (io/native sort drops headers) — a scan
    of the records themselves, where each length is the observed
    ``max(pos + len(seq))`` lower bound (sufficient for samtools
    view/sort/index-by-name; genome browsers load their own genome).
    """
    from .sam import parse_sam_line

    refs: Dict[str, int] = dict(references) if references else {}
    if not refs:
        with _open_text(sam_path) as f:
            sq_sized: set = set()
            for line in f:
                if line.startswith("@"):
                    if line.startswith("@SQ"):
                        fields = dict(p.split(":", 1) for p in
                                      line.rstrip("\n").split("\t")[1:]
                                      if ":" in p)
                        if "SN" in fields:
                            refs[fields["SN"]] = int(fields.get("LN", 0))
                            if refs[fields["SN"]] > 0:
                                sq_sized.add(fields["SN"])
                    continue
                # past the header: a record whose reference an @SQ line
                # already sized needs no parse (its LN dominates the
                # max(pos+len) bound) — a cheap 4-field split filters
                # those, so a fully-@SQ-headered multi-GB SAM costs one
                # split per line here instead of a second full parse pass
                # (review find).  Partially-headered SAMs (FakeAligner
                # chunks) still pick up their unheadered references.  The
                # skip set is pinned to header-derived names only: lengths
                # the scan itself records must keep accumulating, else a
                # headerless reference would be sized by its FIRST record
                # rather than max(pos+len) over all of them (review find).
                head = line.split("\t", 4)
                if len(head) > 3 and head[2] in sq_sized:
                    continue
                rec = parse_sam_line(line)
                if rec is None or rec.reference_name is None:
                    continue
                end = rec.pos + max(len(rec.seq), 1)
                if end > refs.get(rec.reference_name, 0):
                    refs[rec.reference_name] = end

    def _records():
        with _open_text(sam_path) as f:
            for line in f:
                if line.startswith("@"):
                    continue
                rec = parse_sam_line(line)
                if rec is not None:
                    yield rec

    write_bam(bam_path, _records(), refs,
              header_text="@HD\tVN:1.6\tSO:queryname\n")


def _open_text(path: str):
    return (gzip.open(path, "rt") if str(path).endswith(".gz")
            else open(path, "r"))


def bam_to_sam(bam_path: str, sam_path: str) -> None:
    """Streaming BAM → SAM text conversion (for the native external
    name-sort/merge, which operates on text lines)."""
    from .sam import format_sam_line

    with open(sam_path, "w") as out:
        for r in read_bam(bam_path):
            out.write(format_sam_line(r))
