"""FASTQ chunking with mate tagging.

Spec: HiCHap/fastqPlus.py:240-348 — stream a (possibly gzipped) FASTQ,
append ``_1`` / ``_2`` to every read name's first token, and write
``<cell>_chunk{i}_{mate}.fastq.gz`` files of ``split_by`` reads each,
validating the ``@`` record header.
"""

from __future__ import annotations

import gzip
import os
import shutil
import subprocess
from typing import List

from ..utils.logging import get_logger

log = get_logger(__name__)


def _reader(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path)


def _writer(path: str):
    """Prefer a pigz subprocess writer when available (fastqPlus.py:240-257);
    fall back to Python gzip."""
    if shutil.which("pigz"):
        out = open(path, "wb")
        proc = subprocess.Popen(["pigz", "-c", "-4"], stdin=subprocess.PIPE,
                                stdout=out, bufsize=-1, text=True)
        class _W:
            def write(self, s):
                proc.stdin.write(s)
            def close(self):
                proc.stdin.close()
                proc.wait()
                out.close()
        return _W()
    gz = gzip.open(path, "wt", compresslevel=4)
    return gz


def split_reads(fq: str, folder: str, split_by: int, mate: int) -> List[int]:
    """Split one mate file into chunks.  Returns per-chunk read counts."""
    os.makedirs(folder, exist_ok=True)
    base = os.path.split(fq)[1].split(".")[0].split("_")
    # cell prefix = filename minus its trailing mate token; the chunk
    # suffix is the MATE PARAMETER — naming it from the filename token
    # broke the downstream ``_chunk{i}_{mate}`` contract for _R1/_R2-style
    # inputs and collided both mates for dot-separated names
    prefix = "_".join(base[:-1]) if len(base) > 1 else base[0]
    out_tpl = prefix + "_chunk{0}_{1}.fastq.gz"

    counts: List[int] = []
    chunk = 0
    with _reader(fq) as src:
        done = False
        while not done:
            out_path = os.path.join(folder, out_tpl.format(chunk, mate))
            w = _writer(out_path)
            n = 0
            for _ in range(split_by):
                header = src.readline()
                if not header:
                    done = True
                    break
                if not header.startswith("@"):
                    raise IOError(f"{fq} is not a fastq file")
                toks = header.split()
                toks[0] = f"{toks[0]}_{mate}"
                w.write(" ".join(toks) + "\n")
                w.write(src.readline())
                w.write(src.readline())
                w.write(src.readline())
                n += 1
            w.close()
            counts.append(n)
            if n == 0:
                os.remove(out_path)
                counts.pop()
                break
            chunk += 1
    log.log(21, "split %s into %d chunks", fq, len(counts))
    return counts
