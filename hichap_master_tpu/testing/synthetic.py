"""Synthetic data generators for hermetic pipeline tests."""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..core.genome import Genome

BASES = np.array(list("ACGT"))


def random_genome(rng, sizes: Dict[str, int]) -> Dict[str, str]:
    """Random DNA per chromosome."""
    return {c: "".join(rng.choice(BASES, size=l)) for c, l in sizes.items()}


def write_genome_size(path: str, sizes: Dict[str, int]) -> str:
    g = Genome(sizes, ())
    g.write(path)
    return path


def random_contacts(rng, genome: Genome, n: int, intra_frac: float = 0.8):
    """(c1, p1, c2, p2) arrays of plausible contacts (positions in bp)."""
    labels = genome.labels
    c1 = rng.integers(0, len(labels), n).astype(np.int32)
    intra = rng.random(n) < intra_frac
    c2 = np.where(intra, c1, rng.integers(0, len(labels), n)).astype(np.int32)
    sizes = np.array([genome.sizes[c] for c in labels])
    p1 = (rng.random(n) * (sizes[c1] - 1)).astype(np.int64) + 1
    # intra contacts decay with distance
    span = (rng.exponential(0.05, n) * sizes[c1]).astype(np.int64)
    p2_intra = np.clip(p1 + np.where(rng.random(n) < 0.5, -span, span),
                       1, sizes[c1] - 1)
    p2_rand = (rng.random(n) * (sizes[c2] - 1)).astype(np.int64) + 1
    p2 = np.where(intra, p2_intra, p2_rand)
    return c1, p1, c2, p2


def write_valid_bed(path: str, genome: Genome, c1, p1, c2, p2, rng) -> str:
    """23ish-column valid bed with the fields matrix-building consumes."""
    labels = genome.labels
    with open(path, "w") as f:
        for i in range(len(c1)):
            name = f"read{i}"
            cols = [
                name, labels[c1[i]], "0", str(int(p1[i])), "100", "-10",
                str(int(p1[i])), "0",
                labels[c2[i]], "16", str(int(p2[i])), "100", "-12",
                str(int(p2[i])), "0",
            ]
            f.write("\t".join(cols) + "\n")
    return path


def diploid_dataset(rng, out_dir: str,
                    chrom_sizes: Dict[str, int] | None = None,
                    n_pairs: int = 400, n_snps: int = 60,
                    read_len: int = 40, enzyme: str = "MboI",
                    junction_frac: float = 0.15) -> Dict[str, str]:
    """A complete hermetic diploid dataset: reference FASTA, phased-SNP TXT,
    and paired FASTQs sampled from the *maternal* genome (so SNP-spanning
    reads only exact-match the maternal haplotype), with a fraction of
    junction-containing chimeric reads to exercise the rescue path."""
    from ..pipeline.enzyme import enzyme_handle, junction_info

    os.makedirs(out_dir, exist_ok=True)
    chrom_sizes = chrom_sizes or {"1": 30_000, "2": 20_000}
    ref = random_genome(rng, chrom_sizes)

    # SNPs: maternal allele == reference base, paternal differs.
    snp_lines = []
    for _ in range(n_snps):
        c = str(rng.choice(list(chrom_sizes)))
        pos = int(rng.integers(read_len + 1, chrom_sizes[c] - read_len))
        base = ref[c][pos - 1]
        alt = str(rng.choice([b for b in "ACGT" if b != base]))
        snp_lines.append(f"{c}\t{pos}\t{base}\t{base}\t{alt}")
    snp_file = os.path.join(out_dir, "snps.txt")
    with open(snp_file, "w") as f:
        f.write("\n".join(snp_lines) + "\n")

    fasta = os.path.join(out_dir, "genome.fa")
    with open(fasta, "w") as f:
        for c in sorted(ref):
            f.write(f">chr{c}\n")
            s = ref[c]
            for i in range(0, len(s), 60):
                f.write(s[i : i + 60] + "\n")

    site, cutsite = enzyme_handle(enzyme)
    jplus, _, _ = junction_info(site, cutsite)
    comp = str.maketrans("ACGT", "TGCA")

    r1_path = os.path.join(out_dir, "cell_R1_1.fastq")
    r2_path = os.path.join(out_dir, "cell_R1_2.fastq")
    with open(r1_path, "w") as f1, open(r2_path, "w") as f2:
        for i in range(n_pairs):
            c = str(rng.choice(list(chrom_sizes)))
            L = chrom_sizes[c]
            p1 = int(rng.integers(0, L - read_len))
            p2 = int(rng.integers(0, L - read_len))
            s1 = ref[c][p1 : p1 + read_len]
            s2 = ref[c][p2 : p2 + read_len].translate(comp)[::-1]
            if rng.random() < junction_frac:
                # chimeric R1: 18 bp + junction + 18 bp from elsewhere
                p3 = int(rng.integers(0, L - read_len))
                s1 = (ref[c][p1 : p1 + 18] + jplus
                      + ref[c][p3 : p3 + 18])
                s1 = s1[:read_len] if len(s1) > read_len else s1
            q1 = "I" * len(s1)
            q2 = "I" * len(s2)
            f1.write(f"@pair{i}\n{s1}\n+\n{q1}\n")
            f2.write(f"@pair{i}\n{s2}\n+\n{q2}\n")
    return {"fasta": fasta, "snps": snp_file, "fq1": r1_path, "fq2": r2_path,
            "sizes": chrom_sizes}


def write_allelic_beds(dirpath: str, prefix: str, genome: Genome, rng,
                       n: int = 3000) -> Dict[str, str]:
    """Write the five allelic bed classes with plausible tags."""
    os.makedirs(dirpath, exist_ok=True)
    labels = genome.labels
    out = {}
    for kind, frac, tagged in (
        ("Bi_Allelic", 1.0, False), ("M_M", 0.5, True), ("P_P", 0.5, True),
        ("M_P", 0.05, False), ("P_M", 0.05, False),
    ):
        m = max(10, int(n * frac))
        c1, p1, c2, p2 = random_contacts(rng, genome, m)
        path = os.path.join(dirpath, f"{prefix}Valid_{kind}.bed")
        with open(path, "w") as f:
            for i in range(m):
                cols = [labels[c1[i]], str(int(p1[i])),
                        labels[c2[i]], str(int(p2[i]))]
                if tagged:
                    cols.append(rng.choice(["Both", "Both", "R1", "R2"]))
                f.write("\t".join(cols) + "\n")
        out[kind] = path
    return out
