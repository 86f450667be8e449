"""FASTA read/write and SNP-table persistence.

Replaces the reference's per-character list handling (HiCHap/genome.py:55-66,
196-206) with byte-array I/O: a chromosome is a ``np.uint8`` array, so SNP
substitution and restriction-site scanning are vectorized numpy ops.

SNP tables persist as ``.npz`` (per-chromosome sorted pos/ref/m_alt/p_alt
arrays).  For compatibility, ``load_snps`` also reads the reference's
``Snps.pickle`` layout (a pickled dict, HiCHap/genome.py:116-118).
"""

from __future__ import annotations

import gzip
import os
import pickle
from typing import Dict, Iterator, Tuple

import numpy as np

from ..core.genome import strip_chr


def _open(path, mode="rt"):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def read_fasta(path: str) -> Dict[str, np.ndarray]:
    """chrom (without 'chr') → uint8 sequence array."""
    out: Dict[str, np.ndarray] = {}
    name = None
    parts = []
    with _open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if name is not None:
                    out[name] = np.frombuffer(
                        "".join(parts).encode(), dtype=np.uint8).copy()
                name = strip_chr(line[1:].split()[0])
                parts = []
            elif line:
                parts.append(line)
    if name is not None:
        out[name] = np.frombuffer("".join(parts).encode(),
                                  dtype=np.uint8).copy()
    return out


def write_fasta(path: str, chroms: Dict[str, np.ndarray],
                line_width: int = 60) -> None:
    """Write with the reference's header style and 60-column wrap
    (HiCHap/genome.py:125-137)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        for c in sorted(chroms):
            seq = chroms[c].tobytes().decode()
            n = len(seq)
            f.write(f">chr{c} dna:chromosome chromosome:HapHiC:1:1:{n}:1 REF\n")
            for i in range(0, n, line_width):
                f.write(seq[i : i + line_width] + "\n")


# ------------------------------------------------------------------ SNPs
def parse_snp_file(path: str) -> Dict[str, dict]:
    """5-column SNP TXT (chrom, pos, ref, m_alt, p_alt) → per-chrom sorted
    arrays (HiCHap/genome.py:87-114)."""
    cols: Dict[str, list] = {}
    with _open(path) as f:
        for line in f:
            p = line.split()
            if len(p) < 5:
                continue
            cols.setdefault(strip_chr(p[0]), []).append(
                (int(p[1]), p[2], p[3], p[4]))
    out = {}
    for c, rows in cols.items():
        rows.sort(key=lambda r: r[0])
        out[c] = {
            "pos": np.asarray([r[0] for r in rows], np.int64),
            "ref": np.asarray([r[1] for r in rows]),
            "m_alt": np.asarray([r[2] for r in rows]),
            "p_alt": np.asarray([r[3] for r in rows]),
        }
    return out


def save_snps(snps: Dict[str, dict], path: str) -> None:
    """Persist as npz (keys ``<chrom>/<field>``)."""
    flat = {}
    for c, d in snps.items():
        for k, v in d.items():
            flat[f"{c}/{k}"] = v
    np.savez_compressed(path, **flat)


def _str_alleles(d: dict) -> dict:
    """Allele columns as unicode: the reference's py2 pickle stores 'S1'
    bytes, and ``snps_match`` compares against str read bases — a bytes
    column made every SNP count silently zero in allelic mode."""
    return {k: (v.astype("U") if v.dtype.kind == "S" else v)
            for k, v in d.items()}


def load_snps(path: str) -> Dict[str, dict]:
    """Load our npz or the reference's ``Snps.pickle``."""
    if path.endswith(".pickle") or path.endswith(".pkl"):
        with open(path, "rb") as f:
            raw = pickle.load(f, encoding="latin1")
        return {
            c: _str_alleles({k: np.asarray(v) for k, v in d.items()})
            for c, d in raw.items()
        }
    data = np.load(path, allow_pickle=False)
    out: Dict[str, dict] = {}
    for key in data.files:
        c, field = key.split("/", 1)
        out.setdefault(c, {})[field] = data[key]
    return {c: _str_alleles(d) for c, d in out.items()}


def find_sites(seq: np.ndarray, site: str) -> np.ndarray:
    """0-based start positions of every occurrence of ``site`` in ``seq``
    (uppercase comparison), vectorized."""
    s = np.frombuffer(site.encode(), dtype=np.uint8)
    L = len(s)
    if len(seq) < L:
        return np.zeros(0, np.int64)
    # uppercase: fold a..z onto A..Z
    up = np.where((seq >= 97) & (seq <= 122), seq - 32, seq)
    hits = np.ones(len(seq) - L + 1, bool)
    for k in range(L):
        hits &= up[k : len(seq) - L + 1 + k] == s[k]
    return np.flatnonzero(hits).astype(np.int64)
