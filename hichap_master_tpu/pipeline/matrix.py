"""Contact-matrix construction: traditional and haplotype-resolved.

Drivers with the same outputs as the reference's
``TraditionalMatrixConstruction`` (HiCHap/matrixBuilding.py:617-717) and
``HaplotypeMatrixConstruction`` (matrixBuilding.py:1641-1861):

  * ``<prefix>Multi.cool`` / ``Merged_Multi.cool`` — traditional counts,
    ICE-balanced (weights stored like ``cooler balance --ignore-diags 1``,
    cis-only for intra-chromosome resolutions);
  * ``<prefix>Traditional_Multi.cool`` — traditional counts built from the
    five allelic bed classes;
  * ``<prefix>UnImputated_Haplotype_Multi.cool`` — both-side haplotype counts;
  * ``<prefix>Imputated_Haplotype_Multi.cool`` — imputed + two-step-corrected
    float matrices (no balance weights: counts already corrected);
  * ``<prefix>Imputated_Gap.npz`` — per-resolution gap-bin arrays;
  * ``Merged_*`` variants summing replicates before correction.

All binning and correction runs on-device; the host only parses beds and
moves finished matrices to HDF5.  Bugs fixed vs the reference (see
DIVERGENCES.md): the P_P inter-imputation stale-neighborhood branch, the R2
crossed chromosome offsets, and the single-replicate missing-kwarg crash
(matrixBuilding.py:1676-1683).
"""

from __future__ import annotations

import os
from typing import Dict, List, Mapping, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.contacts import bucket_groups, pad_to_bucket
from ..core.genome import Genome
from ..io.bedio import (
    TAG_BOTH,
    TAG_R1,
    bed_prefix,
    discover_allelic_beds,
    iter_valid_bed,
    read_allelic_bed,
)
from ..io.cooler import CoolerReader, CoolerWriter, write_cooler
from ..ops.balance import ice_balance
from ..ops.binning import (
    bin_genomewide,
    bin_genomewide_directed,
    bin_genomewide_single_side_intra,
    bin_intra,
    bin_intra_single_side,
    stream_chunks,
)
from ..ops.correct import genomewide_alpha, genomewide_correction, two_step_correction
from ..ops.imputation import disk_offsets, impute_inter_chunk
from ..utils.logging import get_logger
from ..utils.profiling import stage

log = get_logger(__name__)

CHUNK = 1 << 19

# Above this genome-wide bin count the dense [S, S] form stops being
# reasonable (at 65,536 bins it is already 16 GB f32 — one full chip) and
# the pipeline switches to the block-sparse layout (ops/sparse.py).  This
# is what makes true genome-wide 10 kb matrices (hg19 ≈ 304k bins, ~343 GB
# dense) constructible: memory is O(nnz), the size of the output cooler.
DENSE_GW_MAX_BINS = int(os.environ.get("HICHAP_DENSE_GW_MAX_BINS", "65536"))


class SparseGW:
    """Genome-wide contact accumulator in upper-triangle COO key space.

    Pending binned pairs compact periodically through np.unique, so host
    memory stays O(unique pixels) — the same order as the cooler this will
    be written to.  Matches ``bin_genomewide`` semantics (symmetric count;
    diagonal counted once)."""

    def __init__(self, S: int, compact_every: int = 1 << 24):
        self.S = S
        self.keys = np.zeros(0, np.int64)
        self.cnts = np.zeros(0, np.float64)
        self._pend: List[np.ndarray] = []
        self._pend_n = 0
        self._compact_every = compact_every

    def add(self, b1: np.ndarray, b2: np.ndarray) -> None:
        # XLA drops out-of-bounds scatter updates in the dense path;
        # mirror that (a >=S bin would otherwise crash the cooler writer)
        ok = (b1 >= 0) & (b1 < self.S) & (b2 >= 0) & (b2 < self.S)
        b1, b2 = b1[ok], b2[ok]
        lo = np.minimum(b1, b2).astype(np.int64)
        hi = np.maximum(b1, b2).astype(np.int64)
        self._pend.append(lo * self.S + hi)
        self._pend_n += lo.size
        if self._pend_n >= self._compact_every:
            self._compact()

    def _compact(self) -> None:
        if not self._pend:
            return
        allk = np.concatenate([self.keys] + self._pend)
        allc = np.concatenate(
            [self.cnts] + [np.ones(k.size) for k in self._pend])
        self.keys, inv = np.unique(allk, return_inverse=True)
        self.cnts = np.bincount(inv, weights=allc)
        self._pend, self._pend_n = [], 0

    def coo(self):
        self._compact()
        return self.keys // self.S, self.keys % self.S, self.cnts

    def __add__(self, other):
        if not isinstance(other, SparseGW):  # sum() starts from 0
            if other == 0:
                return self
            return NotImplemented
        assert self.S == other.S
        self._compact()
        other._compact()
        out = SparseGW(self.S)
        allk = np.concatenate([self.keys, other.keys])
        allc = np.concatenate([self.cnts, other.cnts])
        out.keys, inv = np.unique(allk, return_inverse=True)
        out.cnts = np.bincount(inv, weights=allc)
        return out

    __radd__ = __add__


def _gw_is_sparse(genome: Genome, res: int) -> bool:
    return genome.total_bins(res) > DENSE_GW_MAX_BINS


# --------------------------------------------------------------- binning
def _offsets_array(genome: Genome, res: int) -> np.ndarray:
    offs = genome.bin_offsets(res)
    return np.asarray([offs[c][0] for c in genome.labels], dtype=np.int64)


# Host-bincount binning policy: XLA scatter-add serializes per update on
# TPU (measured ~2M contacts/s over [S,S]/[C,N,N] targets), while
# np.bincount over flattened bin pairs runs O(cells) at ~31M cells/s on
# this host (scripts/perf_ingest.py).  The host path therefore wins only
# when the target is DENSE relative to the contact count — measured
# crossover cells ≈ 15x contacts, applied with margin — and must also fit
# host memory.  HICHAP_HOST_BINCOUNT=0 forces the device scatter path.
_HOST_BINCOUNT_CELLS = 1 << 28
_HOST_BINCOUNT_CELLS_PER_CONTACT = 8


def _host_bincount_ok(cells: int, contacts: int) -> bool:
    return (os.environ.get("HICHAP_HOST_BINCOUNT", "1") != "0"
            and cells <= _HOST_BINCOUNT_CELLS
            and cells <= _HOST_BINCOUNT_CELLS_PER_CONTACT * max(contacts, 1))


def _sym_from_counts(C: np.ndarray) -> np.ndarray:
    """Symmetric matrix from directed counts, diagonal counted once
    (matrixBuilding.py:588-592 semantics)."""
    M = (C + np.swapaxes(C, -1, -2)).astype(np.float32)
    d = np.arange(C.shape[-1])
    M[..., d, d] -= C[..., d, d]
    return M


def accumulate_genomewide(c1, p1, c2, p2, genome: Genome, res: int,
                          acc: np.ndarray | None = None) -> np.ndarray:
    S = genome.total_bins(res)
    if _host_bincount_ok(S * S, len(c1)):
        offs = _offsets_array(genome, res)
        b1 = p1 // res + offs[c1]
        b2 = p2 // res + offs[c2]
        # XLA drops out-of-bounds scatter updates; mirror that here
        ok = (b1 >= 0) & (b1 < S) & (b2 >= 0) & (b2 < S)
        C = np.bincount(b1[ok].astype(np.int64) * S + b2[ok],
                        minlength=S * S).reshape(S, S)
        M = _sym_from_counts(C)
        return M if acc is None else np.asarray(acc) + M
    offsets = jnp.asarray(_offsets_array(genome, res))
    dev = jnp.zeros((S, S), jnp.float32) if acc is None else jnp.asarray(acc)
    for (cc1, pp1, cc2, pp2), valid in stream_chunks([c1, p1, c2, p2], CHUNK):
        dev = bin_genomewide(dev, jnp.asarray(cc1), jnp.asarray(pp1),
                             jnp.asarray(cc2), jnp.asarray(pp2), offsets,
                             jnp.asarray(valid), res)
    return np.asarray(dev)


def accumulate_intra(c1, p1, c2, p2, genome: Genome, res: int,
                     init: Mapping[str, np.ndarray] | None = None,
                     tags=None) -> Dict[str, np.ndarray]:
    """Per-chromosome intra matrices, bucketed by padded size.

    With ``tags`` given (R1/R2 int codes), contacts accumulate into a single
    triangle per the single-side rule; otherwise symmetric increments.
    """
    nb = {c: genome.n_bins(c, res) for c in genome.labels}
    out: Dict[str, np.ndarray] = {}
    label_idx = {c: i for i, c in enumerate(genome.labels)}
    intra_sel = c1 == c2
    for group, N in bucket_groups(genome.labels, nb):
        gpos = np.full(len(genome.labels), -1, np.int32)
        for gi, c in enumerate(group):
            gpos[label_idx[c]] = gi
        sel = intra_sel & (gpos[c1] >= 0)
        gc = gpos[c1[sel]]
        gp1 = p1[sel]
        gp2 = p2[sel]
        cells = len(group) * N * N
        if tags is None and _host_bincount_ok(cells, int(sel.sum())):
            b1 = gp1 // res
            b2 = gp2 // res
            # XLA drops out-of-bounds scatter updates; mirror that here
            ok = (b1 >= 0) & (b1 < N) & (b2 >= 0) & (b2 < N)
            gci, b1, b2 = gc[ok], b1[ok], b2[ok]
            C = np.bincount((gci.astype(np.int64) * N + b1) * N + b2,
                            minlength=cells).reshape(len(group), N, N)
            M = _sym_from_counts(C)
            for gi, c in enumerate(group):
                m = M[gi, : nb[c], : nb[c]]
                prev = init.get(c) if init is not None else None
                if prev is not None:
                    m = m.copy()
                    m[: prev.shape[0], : prev.shape[1]] += prev
                out[c] = m
            continue
        dev = jnp.zeros((len(group), N, N), jnp.float32)
        if init is not None:
            base = np.zeros((len(group), N, N), np.float32)
            for gi, c in enumerate(group):
                m = init.get(c)
                if m is not None:
                    base[gi, : m.shape[0], : m.shape[1]] = m
            dev = jnp.asarray(base)
        if tags is None:
            for (a, b, d), valid in stream_chunks([gc, gp1, gp2], CHUNK):
                dev = bin_intra(dev, jnp.asarray(a), jnp.asarray(b),
                                jnp.asarray(a), jnp.asarray(d),
                                jnp.asarray(valid), res)
        else:
            gt = tags[sel]
            for (a, b, d, t), valid in stream_chunks([gc, gp1, gp2, gt], CHUNK):
                dev = bin_intra_single_side(
                    dev, jnp.asarray(a), jnp.asarray(b), jnp.asarray(a),
                    jnp.asarray(d), jnp.asarray(t == TAG_R1),
                    jnp.asarray(valid), res)
        host = np.asarray(dev)
        for gi, c in enumerate(group):
            out[c] = host[gi, : nb[c], : nb[c]]
    return out


def build_traditional_stream(files: Sequence[str], genome: Genome,
                             whole_res: Sequence[int],
                             local_res: Sequence[int]):
    """Single streaming pass over the valid beds updating every resolution's
    accumulators per chunk (no full-file load; reference holds all matrices
    in RAM the same way, matrixBuilding.py:549-565)."""
    sparse_res = [res for res in whole_res if _gw_is_sparse(genome, res)]
    dense_res = [res for res in whole_res if res not in sparse_res]
    whole_offs = {res: jnp.asarray(_offsets_array(genome, res))
                  for res in dense_res}
    whole_acc = {res: jnp.zeros((genome.total_bins(res),) * 2, jnp.float32)
                 for res in dense_res}
    sparse_offs = {res: _offsets_array(genome, res) for res in sparse_res}
    sparse_acc = {res: SparseGW(genome.total_bins(res))
                  for res in sparse_res}
    nb = {res: {c: genome.n_bins(c, res) for c in genome.labels}
          for res in local_res}
    label_idx = {c: i for i, c in enumerate(genome.labels)}
    local_groups = {res: bucket_groups(genome.labels, nb[res])
                    for res in local_res}
    local_acc = {
        res: [jnp.zeros((len(g), N, N), jnp.float32)
              for g, N in local_groups[res]]
        for res in local_res
    }
    gpos = {}
    for res in local_res:
        for gi, (group, _N) in enumerate(local_groups[res]):
            pos = np.full(len(genome.labels), -1, np.int32)
            for k, c in enumerate(group):
                pos[label_idx[c]] = k
            gpos[(res, gi)] = pos

    total = 0
    for c1, p1, c2, p2 in iter_valid_bed(files, genome):
        total += len(c1)
        for res in sparse_res:
            offs = sparse_offs[res]
            sparse_acc[res].add(offs[c1] + p1 // res, offs[c2] + p2 // res)
        if dense_res:
            for (cc1, pp1, cc2, pp2), valid in stream_chunks(
                    [c1, p1, c2, p2], CHUNK):
                a1 = jnp.asarray(cc1)
                a2 = jnp.asarray(cc2)
                b1 = jnp.asarray(pp1)
                b2 = jnp.asarray(pp2)
                vj = jnp.asarray(valid)
                for res in dense_res:
                    whole_acc[res] = bin_genomewide(
                        whole_acc[res], a1, b1, a2, b2, whole_offs[res], vj,
                        res)
        intra = c1 == c2
        for res in local_res:
            for gi, (group, N) in enumerate(local_groups[res]):
                pos = gpos[(res, gi)]
                sel = intra & (pos[c1] >= 0)
                gc = pos[c1[sel]]
                gp1 = p1[sel]
                gp2 = p2[sel]
                for (a, b, d), valid in stream_chunks([gc, gp1, gp2], CHUNK):
                    local_acc[res][gi] = bin_intra(
                        local_acc[res][gi], jnp.asarray(a), jnp.asarray(b),
                        jnp.asarray(a), jnp.asarray(d), jnp.asarray(valid),
                        res)

    whole: Dict[int, np.ndarray | SparseGW] = {
        res: np.asarray(acc) for res, acc in whole_acc.items()}
    whole.update(sparse_acc)
    local: Dict[int, Dict[str, np.ndarray]] = {}
    for res in local_res:
        local[res] = {}
        for gi, (group, N) in enumerate(local_groups[res]):
            host = np.asarray(local_acc[res][gi])
            for k, c in enumerate(group):
                n = nb[res][c]
                local[res][c] = host[k, :n, :n]
    return whole, local, total


# ------------------------------------------------------------ balancing
def _write_weights(path: str, genome: Genome, res: int, cis_only: bool) -> None:
    """ICE-balance a written cooler group in place (``cooler balance`` parity:
    --ignore-diags 1, and --cis-only for intra-chromosome resolutions)."""
    r = CoolerReader(path, res)
    if cis_only:
        ws = []
        for c in r.chromnames:
            Mj, n = r.matrix_device(c)
            w, _ = ice_balance(Mj, jnp.asarray(n))
            ws.append(np.asarray(w)[:n])
        weights = np.concatenate(ws)
    elif genome.total_bins(res) > DENSE_GW_MAX_BINS:
        # block-sparse genome-wide balance (the dense [S, S] form would be
        # hundreds of GB at 10 kb); works directly in cooler bin space
        from ..ops.sparse import blocks_from_coo, ice_balance_blocks

        b1, b2, v = r.pixels_coo()
        bm = blocks_from_coo(b1, b2, v.astype(np.float32), r.nbins)
        w, _ = ice_balance_blocks(bm)
        weights = np.asarray(w)[: r.nbins]
    else:
        Mj, S = r.genomewide_device()
        w, _ = ice_balance(Mj, jnp.asarray(S))
        weights = np.asarray(w)[:S]
    r.set_weights(weights)


# ---------------------------------------------------- traditional driver
def traditional_matrix_construction(
    out_path: str, rep_paths: Sequence[str], genome_size: str,
    whole_res: Sequence[int], local_res: Sequence[int],
    chroms: Sequence[str] = ("#", "X"), balance: bool = True,
) -> Dict[str, str]:
    genome = Genome.from_file(genome_size, chroms)
    cooler_dir = os.path.join(out_path, "Cooler")
    os.makedirs(cooler_dir, exist_ok=True)

    whole_res = list(whole_res or [])
    local_res = list(local_res or [])
    rep_whole: List[Dict[int, np.ndarray]] = []
    rep_local: List[Dict[int, Dict[str, np.ndarray]]] = []
    coolers = []

    for rep in rep_paths:
        files = [os.path.join(rep, f) for f in sorted(os.listdir(rep))
                 if f.endswith("_Valid.bed")]
        if not files:
            raise FileNotFoundError(f"no *_Valid.bed under {rep}")
        prefix = bed_prefix(files)
        whole, local, total = build_traditional_stream(
            files, genome, whole_res, local_res)
        log.log(21, "replicate %s: %d valid pairs", prefix, total)
        rep_whole.append(whole)
        rep_local.append(local)

        path = os.path.join(cooler_dir, prefix + "Multi.cool")
        _write_traditional_cooler(path, genome, whole, local)
        coolers.append(path)

    merged = os.path.join(cooler_dir, "Merged_Multi.cool")
    whole_m = {res: sum(w[res] for w in rep_whole) for res in whole_res}
    local_m = {
        res: {c: sum(l[res][c] for l in rep_local) for c in genome.labels}
        for res in local_res
    }
    _write_traditional_cooler(merged, genome, whole_m, local_m)
    coolers.append(merged)

    if balance:
        for path in coolers:
            for res in whole_res:
                _write_weights(path, genome, res, cis_only=False)
            for res in local_res:
                _write_weights(path, genome, res, cis_only=True)
    return {"coolers": coolers, "merged": merged}


def _write_traditional_cooler(path, genome, whole, local):
    if os.path.exists(path):
        os.remove(path)
    for res, M in whole.items():
        if isinstance(M, SparseGW):
            write_cooler(path, genome, res, {}, genomewide_coo=M.coo(),
                         dtype="int", metadata={"onlyIntra": "False"})
        else:
            write_cooler(path, genome, res, {}, genomewide=M, dtype="int",
                         metadata={"onlyIntra": "False"})
    for res, mats in local.items():
        write_cooler(path, genome, res, mats, dtype="int",
                     metadata={"onlyIntra": "True"})


# ------------------------------------------------------ haplotype driver
def build_haplotype_datasets(
    bed_path: str, genome: Genome, whole_res: Sequence[int],
    local_res: Sequence[int], imputation_region: int = 10_000_000,
    imputation_min: int = 2, imputation_ratio: float = 0.9,
):
    """One replicate: all matrices of the haplotype pipeline, as host arrays.

    Returns dict with keys Tradition_Whole/Tradition_Local/UnImputated_*/
    Imputated_* mirroring the reference's DataSets (matrixBuilding.py:1044-1638).
    """
    beds = discover_allelic_beds(bed_path)
    prefix = bed_prefix([f for v in beds.values() for f in v])
    hap = genome.haplotype()
    nc = len(genome.labels)

    too_fine = [res for res in whole_res
                if hap.total_bins(res) > DENSE_GW_MAX_BINS]
    if too_fine:
        raise ValueError(
            f"haplotype whole-genome resolutions {too_fine} exceed "
            f"{DENSE_GW_MAX_BINS} bins (diploid genome): the imputation "
            "disk vote needs the dense genome-wide matrix.  Use a coarser "
            "wholeRes (the reference runs haplotype wholeRes >= 2 Mb, "
            "README.md:312-318); genome-wide balancing/correction at fine "
            "resolutions is available via ops/sparse.py "
            "(sparse_ice_balance, sparse_genomewide_correction).")

    # ---- traditional matrices from all five bed classes (cols 0-3) -------
    all_files = [f for k in ("Bi_Allelic", "M_M", "P_P", "M_P", "P_M")
                 for f in beds[k]]
    tc1, tp1, tc2, tp2 = read_allelic_bed(all_files, genome, with_tag=False)
    tradition_whole = {res: accumulate_genomewide(tc1, tp1, tc2, tp2, genome, res)
                       for res in whole_res}
    tradition_local = {res: accumulate_intra(tc1, tp1, tc2, tp2, genome, res)
                       for res in local_res}

    # ---- both-side haplotype contacts ------------------------------------
    mm = read_allelic_bed(beds["M_M"], genome, with_tag=True)
    pp = read_allelic_bed(beds["P_P"], genome, with_tag=True)
    mp = read_allelic_bed(beds["M_P"], genome, with_tag=False)
    pm = read_allelic_bed(beds["P_M"], genome, with_tag=False)

    def hap_whole(res: int) -> np.ndarray:
        S = hap.total_bins(res)
        offs = _offsets_array(hap, res)
        m_off = jnp.asarray(offs[:nc])
        p_off = jnp.asarray(offs[nc:])
        dev = jnp.zeros((S, S), jnp.float32)
        for (c1, p1, c2, p2, tag), hoff1, hoff2, sym in (
            (mm, m_off, m_off, True),
            (pp, p_off, p_off, True),
            (mp + (None,), m_off, p_off, False),
            (pm + (None,), p_off, m_off, False),
        ):
            if sym:
                sel = tag == TAG_BOTH
                cols = [c1[sel], p1[sel], c2[sel], p2[sel]]
            else:
                cols = [c1, p1, c2, p2]
            for (a, b, d, e), valid in stream_chunks(cols, CHUNK):
                dev = bin_genomewide_directed(
                    dev, jnp.asarray(a), jnp.asarray(b), jnp.asarray(d),
                    jnp.asarray(e), hoff1, hoff2, jnp.asarray(valid), res)
        # bin_genomewide_directed double-counts diagonal hits for the
        # symmetric classes; reference counts them once.  Halve the diagonal
        # surplus: recompute diag from symmetric classes.
        return np.asarray(dev)

    # The directed kernel adds [b1,b2] and [b2,b1] always; for b1==b2 that is
    # a double count.  Correct by accumulating diagonal hits separately.
    def hap_whole_exact(res: int) -> np.ndarray:
        M = np.array(hap_whole(res))  # writable host copy
        offs = _offsets_array(hap, res)
        diag_fix = np.zeros(M.shape[0], np.float64)
        for (c1, p1, c2, p2, tag), off1, off2 in (
            (mm, offs[:nc], offs[:nc]),
            (pp, offs[nc:], offs[nc:]),
            (mp + (None,), offs[:nc], offs[nc:]),
            (pm + (None,), offs[nc:], offs[:nc]),
        ):
            if tag is not None:
                sel = tag == TAG_BOTH
                c1, p1, c2, p2 = c1[sel], p1[sel], c2[sel], p2[sel]
            b1 = p1 // res + off1[c1]
            b2 = p2 // res + off2[c2]
            same = b1 == b2
            if same.any():
                np.add.at(diag_fix, b1[same], 1)
        M[np.arange(M.shape[0]), np.arange(M.shape[0])] -= diag_fix
        return M

    unimp_whole = {res: hap_whole_exact(res) for res in whole_res}

    def hap_local(res: int) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        for (c1, p1, c2, p2, tag), pref in ((mm, "M"), (pp, "P")):
            sel = tag == TAG_BOTH
            mats = accumulate_intra(c1[sel], p1[sel], c2[sel], p2[sel],
                                    genome, res)
            for c, m in mats.items():
                out[pref + c] = m
        return out

    unimp_local = {res: hap_local(res) for res in local_res}

    # ---- imputation -------------------------------------------------------
    imp_whole = {res: m.copy() for res, m in unimp_whole.items()}
    imp_local = {
        res: {c: m.copy() for c, m in lib.items()}
        for res, lib in unimp_local.items()
    }

    offs_by_res = {res: _offsets_array(hap, res) for res in whole_res}

    for (c1, p1, c2, p2, tag), hap_side in ((mm, "M"), (pp, "P")):
        single = tag != TAG_BOTH
        s_c1, s_p1, s_c2, s_p2, s_tag = (
            c1[single], p1[single], c2[single], p2[single], tag[single])
        intra = s_c1 == s_c2
        base = 0 if hap_side == "M" else nc

        # intra: one-triangle increments at whole and local resolutions
        for res in whole_res:
            offs = offs_by_res[res]
            b1 = s_p1[intra] // res + offs[s_c1[intra] + base]
            b2 = s_p2[intra] // res + offs[s_c2[intra] + base]
            r1 = s_tag[intra] == TAG_R1
            dev = jnp.asarray(imp_whole[res])
            for (bb1, bb2, rr1), valid in stream_chunks(
                    [b1, b2, r1.astype(np.int8)], CHUNK):
                dev = bin_genomewide_single_side_intra(
                    dev, jnp.asarray(bb1), jnp.asarray(bb2),
                    jnp.asarray(rr1 == 1), jnp.asarray(valid), res)
            imp_whole[res] = np.asarray(dev)

        for res in local_res:
            mats = accumulate_intra(
                s_c1[intra], s_p1[intra], s_c2[intra], s_p2[intra], genome,
                res,
                init={c[1:]: m for c, m in imp_local[res].items()
                      if c[0] == hap_side},
                tags=s_tag[intra])
            for c, m in mats.items():
                imp_local[res][hap_side + c] = m

        # inter: disk vote at whole resolutions
        inter = ~intra
        for res in whole_res:
            L = imputation_region // res
            if L < 1:
                continue
            di_np, dj_np = disk_offsets(L)
            if len(di_np) == 0:
                continue
            offs = offs_by_res[res]
            ic1, ip1 = s_c1[inter], s_p1[inter]
            ic2, ip2 = s_c2[inter], s_p2[inter]
            r1 = s_tag[inter] == TAG_R1
            other = nc if hap_side == "M" else -nc
            # known side: mate1 when R1 else mate2; candidates on the
            # unknown side's own chromosome (reference offset bug fixed).
            known_bin = np.where(r1, ip1 // res + offs[ic1 + base],
                                 ip2 // res + offs[ic2 + base])
            unk_c = np.where(r1, ic2, ic1)
            unk_p = np.where(r1, ip2, ip1)
            col_same = unk_p // res + offs[unk_c + base]
            col_cross = unk_p // res + offs[unk_c + base + other]
            U = jnp.asarray(unimp_whole[res])
            dev = jnp.asarray(imp_whole[res])
            di, dj = jnp.asarray(di_np), jnp.asarray(dj_np)
            for (rk, csame, ccross), valid in stream_chunks(
                    [known_bin, col_same, col_cross], CHUNK):
                dev = impute_inter_chunk(
                    dev, U, jnp.asarray(rk), jnp.asarray(csame),
                    jnp.asarray(ccross), jnp.asarray(valid), di, dj, L,
                    float(imputation_min), float(imputation_ratio))
            imp_whole[res] = np.asarray(dev)

    return {
        "prefix": prefix,
        "Tradition_Whole": tradition_whole,
        "Tradition_Local": tradition_local,
        "UnImputated_Whole": unimp_whole,
        "UnImputated_Local": unimp_local,
        "Imputated_Whole": imp_whole,
        "Imputated_Local": imp_local,
    }


def correct_haplotype_datasets(data, genome: Genome,
                               whole_res: Sequence[int],
                               local_res: Sequence[int]):
    """Two-step corrections → (balanced_whole, balanced_local, gaps)."""
    hap = genome.haplotype()
    nc = len(genome.labels)

    balanced_whole = {}
    for res in whole_res:
        T = data["Tradition_Whole"][res]
        H = data["Imputated_Whole"][res]
        t_offs = genome.bin_offsets(res)
        h_offs = hap.bin_offsets(res)
        alphas = []
        for c in genome.labels:
            s, e = t_offs[c]
            n = e - s + 1
            N = pad_to_bucket(n)
            tb = np.zeros((N, N), np.float32)
            tb[:n, :n] = T[s : e + 1, s : e + 1]
            ms, me = h_offs["M" + c]
            ps, pe = h_offs["P" + c]
            mb = np.zeros((N, N), np.float32)
            mb[:n, :n] = H[ms : me + 1, ms : me + 1]
            pb = np.zeros((N, N), np.float32)
            pb[:n, :n] = H[ps : pe + 1, ps : pe + 1]
            a = genomewide_alpha(jnp.asarray(tb), jnp.asarray(mb),
                                 jnp.asarray(pb), jnp.asarray(n))
            alphas.append(np.asarray(a)[:n])
        alpha_full = np.concatenate(alphas)
        alpha_full = np.concatenate([alpha_full, alpha_full])
        bal = genomewide_correction(jnp.asarray(H, jnp.float32),
                                    jnp.asarray(alpha_full, jnp.float32),
                                    jnp.asarray(H.shape[0]))
        balanced_whole[res] = np.asarray(bal)

    balanced_local = {}
    gaps = {}
    for res in local_res:
        tra = data["Tradition_Local"][res]
        happ = data["Imputated_Local"][res]
        out = {}
        gap_lib = {}
        for c in genome.labels:
            n = genome.n_bins(c, res)
            N = pad_to_bucket(n)

            def _pad(m):
                z = np.zeros((N, N), np.float32)
                z[: m.shape[0], : m.shape[1]] = m
                return z

            nm, npm, gm, gp = two_step_correction(
                jnp.asarray(_pad(tra[c])), jnp.asarray(_pad(happ["M" + c])),
                jnp.asarray(_pad(happ["P" + c])), jnp.asarray(n))
            out["M" + c] = np.asarray(nm)[:n, :n]
            out["P" + c] = np.asarray(npm)[:n, :n]
            gap_lib["M" + c] = np.flatnonzero(np.asarray(gm)[:n])
            gap_lib["P" + c] = np.flatnonzero(np.asarray(gp)[:n])
        balanced_local[res] = out
        gaps[str(res)] = gap_lib
    return balanced_whole, balanced_local, gaps


def _write_hap_coolers(cooler_dir, prefix, genome, hap, data, balanced_whole,
                       balanced_local, gaps, whole_res, local_res):
    tradition = os.path.join(cooler_dir, prefix + "Traditional_Multi.cool")
    unimp = os.path.join(cooler_dir, prefix + "UnImputated_Haplotype_Multi.cool")
    imp = os.path.join(cooler_dir, prefix + "Imputated_Haplotype_Multi.cool")
    for p in (tradition, unimp, imp):
        if os.path.exists(p):
            os.remove(p)

    inter_md = {"onlyIntra": "False"}
    intra_md = {"onlyIntra": "True"}
    for res in whole_res:
        write_cooler(tradition, genome, res, {},
                     genomewide=data["Tradition_Whole"][res], dtype="int",
                     metadata=inter_md)
        write_cooler(unimp, hap, res, {},
                     genomewide=data["UnImputated_Whole"][res], dtype="int",
                     metadata=inter_md)
        write_cooler(imp, hap, res, {}, genomewide=balanced_whole[res],
                     dtype="float", metadata=inter_md)
    for res in local_res:
        write_cooler(tradition, genome, res, data["Tradition_Local"][res],
                     dtype="int", metadata=intra_md)
        write_cooler(unimp, hap, res, data["UnImputated_Local"][res],
                     dtype="int", metadata=intra_md)
        write_cooler(imp, hap, res, balanced_local[res], dtype="float",
                     metadata=intra_md)

    for res in whole_res:
        _write_weights(tradition, genome, res, cis_only=False)
    for res in local_res:
        _write_weights(tradition, genome, res, cis_only=True)

    gap_fil = os.path.join(cooler_dir, prefix + "Imputated_Gap.npz")
    np.savez(gap_fil, **{k: np.array(v, dtype=object) for k, v in gaps.items()})
    return {"tradition": tradition, "unimputated": unimp, "imputated": imp,
            "gap": gap_fil}


def haplotype_matrix_construction(
    out_path: str, rep_paths: Sequence[str], genome_size: str,
    whole_res: Sequence[int], local_res: Sequence[int],
    imputation_region: int = 10_000_000, imputation_min: int = 2,
    imputation_ratio: float = 0.9, chroms: Sequence[str] = ("#", "X"),
) -> Dict[str, Dict[str, str]]:
    genome = Genome.from_file(genome_size, chroms)
    hap = genome.haplotype()
    cooler_dir = os.path.join(out_path, "Cooler")
    os.makedirs(cooler_dir, exist_ok=True)
    whole_res = list(whole_res or [])
    local_res = list(local_res or [])

    # Hap_genomeSize next to the coolers (matrixBuilding.py:1551-1564).
    hap.write(os.path.join(cooler_dir, "Hap_genomeSize"))

    all_data = None
    out: Dict[str, Dict[str, str]] = {}
    for rep in rep_paths:
        with stage(f"matrix.build[{os.path.basename(rep.rstrip('/'))}]"):
            data = build_haplotype_datasets(
                rep, genome, whole_res, local_res, imputation_region,
                imputation_min, imputation_ratio)
        with stage("matrix.two_step_correction"):
            bw, bl, gaps = correct_haplotype_datasets(data, genome, whole_res,
                                                      local_res)
        with stage("matrix.cooler_write"):
            out[data["prefix"]] = _write_hap_coolers(
                cooler_dir, data["prefix"], genome, hap, data, bw, bl, gaps,
                whole_res, local_res)
        if all_data is None:
            all_data = data
        else:
            for k in ("Tradition_Whole", "UnImputated_Whole", "Imputated_Whole"):
                for res in whole_res:
                    all_data[k][res] = all_data[k][res] + data[k][res]
            for k in ("Tradition_Local", "UnImputated_Local", "Imputated_Local"):
                for res in local_res:
                    for c in all_data[k][res]:
                        all_data[k][res][c] = all_data[k][res][c] + data[k][res][c]

    if len(rep_paths) > 1:
        bw, bl, gaps = correct_haplotype_datasets(all_data, genome, whole_res,
                                                  local_res)
        out["Merged_"] = _write_hap_coolers(
            cooler_dir, "Merged_", genome, hap, all_data, bw, bl, gaps,
            whole_res, local_res)
    return out
