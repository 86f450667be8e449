"""Genome preparation: SNP integration, diploid rebuild, fragments, indexes.

Re-derivation of HiCHap/genome.py as vectorized array ops:

* ``snps_integration`` — parse the 5-column SNP TXT into per-chromosome
  sorted arrays (genome.py:87-120); persisted as ``Snps.npz``.
* ``rebuild_genome`` — substitute maternal then paternal alleles into the
  byte-array genome (one fancy-index assignment per chromosome instead of
  the reference's per-SNP Python loop, genome.py:217-233), emit both FASTAs,
  ``genomeSize``, per-haplotype fragment tables, and bowtie2 indexes;
* ``build_raw_genome`` — the non-allelic variant (genome.py:140-167);
* ``enzyme_fragments`` — restriction-fragment intervals
  ``[1, cut1), [cut1, cut2), ..., [cutN, len)`` with cut positions
  ``match_start + 1 + fst5`` (genome.py:34-80).

bowtie2-build runs as an external adapter when present; otherwise index
construction is skipped with a warning (the FakeAligner used in hermetic
tests needs no index).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Dict, Sequence

import numpy as np

from ..io.fasta import (
    find_sites,
    parse_snp_file,
    read_fasta,
    save_snps,
    write_fasta,
)
from ..utils.logging import get_logger
from .enzyme import enzyme_handle

log = get_logger(__name__)


def snps_integration(snp_file: str, out_path: str) -> str:
    """Parse + persist the SNP table.  Returns the npz path."""
    snps = parse_snp_file(snp_file)
    out = os.path.join(out_path, "Snps.npz")
    save_snps(snps, out)
    log.log(21, "SNPs integrated: %d chromosomes → %s", len(snps), out)
    return out


def write_genome_size(chroms: Dict[str, np.ndarray], out_path: str) -> str:
    path = os.path.join(out_path, "genomeSize")
    with open(path, "w") as f:
        for c in sorted(chroms):
            f.write(f"{c}\t{len(chroms[c])}\n")
    return path


def enzyme_fragments(chroms: Dict[str, np.ndarray], enzyme: str,
                     out_file: str) -> str:
    """Fragment interval table (chrom, start, end), 1-based half-open."""
    site, cutsite = enzyme_handle(enzyme)
    with open(out_file, "w") as f:
        for c in sorted(chroms):
            L = len(chroms[c])
            starts = find_sites(chroms[c], site) + 1 + cutsite[0]
            # an enzyme cutting at the 3' end of its site (fst5 ==
            # len(site), e.g. NlaIII) puts the cut of a chromosome-final
            # site past the end — clamp so the interval table stays
            # sorted (pairs.frag_mid bisects over it)
            starts = starts[(starts > 1) & (starts <= L)]
            pos = np.concatenate([[1], starts, [L]])
            for i in range(len(pos) - 1):
                f.write(f"{c}\t{pos[i]}\t{pos[i+1]}\n")
    return out_file


def build_index(fasta: str, out_path: str, threads: int = 1,
                bowtie_build: str = "bowtie2-build") -> str | None:
    """bowtie2-build adapter; returns the index prefix or None if absent."""
    prefix = os.path.join(out_path,
                          os.path.basename(fasta).removesuffix(".fa"))
    if shutil.which(bowtie_build) is None:
        log.warning("%s not found; skipping index build for %s "
                    "(FakeAligner needs none)", bowtie_build, fasta)
        return None
    cmd = [bowtie_build, "--threads", str(threads), fasta, prefix]
    log.log(21, "building index: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)
    return prefix


def _substitute(chroms: Dict[str, np.ndarray], snps: Dict[str, dict],
                allele: str) -> None:
    """In-place SNP substitution (positions are 1-based)."""
    for c, d in snps.items():
        if c not in chroms:
            continue
        alt = d[allele]
        if alt.dtype.kind in ("U", "S"):
            alt_bytes = alt.astype("S1").view(np.uint8)
        else:
            alt_bytes = alt.astype(np.uint8)
        chroms[c][d["pos"] - 1] = alt_bytes


def rebuild_genome(genome_path: str, snp_npz_or_txt: str, enzyme: str,
                   out_path: str, threads: int = 1) -> Dict[str, str]:
    """Diploid rebuild: maternal + paternal FASTA / fragments / indexes."""
    from ..io.fasta import load_snps

    if snp_npz_or_txt.endswith((".npz", ".pickle", ".pkl")):
        snps = load_snps(snp_npz_or_txt)
    else:
        snps = parse_snp_file(snp_npz_or_txt)

    log.log(21, "loading genome %s", genome_path)
    chroms = read_fasta(genome_path)
    gsize = write_genome_size(chroms, out_path)

    out: Dict[str, str] = {"genomeSize": gsize}
    for allele, name in (("m_alt", "Maternal"), ("p_alt", "Paternal")):
        log.log(21, "substituting %s alleles", name)
        _substitute(chroms, snps, allele)
        sub_dir = os.path.join(out_path, name)
        os.makedirs(sub_dir, exist_ok=True)
        fa = os.path.join(sub_dir, f"{name}.fa")
        write_fasta(fa, chroms)
        frag = os.path.join(sub_dir, f"{enzyme}_{name}_fragments.txt")
        enzyme_fragments(chroms, enzyme, frag)
        idx = build_index(fa, sub_dir, threads)
        out[name] = fa
        out[f"{name}_fragments"] = frag
        if idx:
            out[f"{name}_index"] = idx
    return out


def build_raw_genome(genome_path: str, enzyme: str, out_path: str,
                     threads: int = 1) -> Dict[str, str]:
    """Non-allelic genome preparation (genome.py:140-167)."""
    chroms = read_fasta(genome_path)
    gsize = write_genome_size(chroms, out_path)
    gname = os.path.basename(genome_path).removesuffix(".fa")
    frag = os.path.join(out_path, f"{enzyme}_{gname}_fragments.txt")
    enzyme_fragments(chroms, enzyme, frag)
    idx = build_index(genome_path, out_path, threads)
    out = {"genomeSize": gsize, "fragments": frag}
    if idx:
        out["index"] = idx
    return out
