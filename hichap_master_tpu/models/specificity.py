"""Allelic-specificity statistical tests for loops, boundaries, compartments.

Behavioral spec: HiCHap/AllelicSpecificity.py (classes
LoopAllelicSpecificity:16-238, BoundaryAllelicSpecificity:242-428,
CompartmentAllelicSpecificity:432-551).  All three are vectorized over loci;
the per-locus scalar statistics match the reference formulas exactly.

Reference bugs fixed (see DIVERGENCES.md):
  * the loop background percentile was taken over ``np.nonzero(Mean)``
    (an index tuple) instead of the values (AllelicSpecificity.py:173-174);
  * several diff-position boundary branches reported stale ``stats`` /
    ``M_mean`` values from earlier loop iterations
    (AllelicSpecificity.py:370-384).
"""

from __future__ import annotations

import bisect
import math
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..io.cooler import CoolerReader
from ..ops.stats import bh_fdr, norm_sf, ttest_rel
from ..utils.logging import get_logger
from .compartment import load_pc_track

log = get_logger(__name__)


def _safe_ttest(a, b):
    """ttest_rel with degenerate pairings (too few joint nonzeros, zero
    variance) mapped to p=1.0 — a single NaN p-value propagates through
    bh_fdr's cumulative minimum and NaNs EVERY q-value in the output."""
    stat, p = ttest_rel(a, b)
    if not np.isfinite(p):
        return np.nan, 1.0
    return stat, p


# ------------------------------------------------------------------ loops
def single_group_stat(p: float, count: float, nobs: float):
    """One-sample proportion statistic with small-count guards and
    continuity correction (AllelicSpecificity.py:118-136)."""
    if count == 0 or (nobs - count) == 0:
        return None
    p_hat = count / nobs
    if p * nobs < 5 or (1 - p) * nobs < 5:
        return None
    if p * nobs >= 30 and (1 - p) * nobs >= 30:
        return (nobs * p_hat - nobs * p) / math.sqrt(nobs * p * (1 - p))
    return (abs(nobs * p_hat - nobs * p) - 0.5) / math.sqrt(nobs * p * (1 - p))


class LoopAllelicSpecificity:
    """Maternal-vs-paternal test for candidate loops.

    ``loop_file`` columns: chrom, M-loc1, M-loc2, P-loc1, P-loc2.
    """

    def __init__(self, cooler_uri: str, loop_file: str, res: int):
        self.reader = CoolerReader(cooler_uri, res)
        self.loop_file = loop_file
        self.res = res

    def _load(self):
        rows = []
        with open(self.loop_file) as f:
            for line in f:
                p = line.split()
                if len(p) >= 5 and not p[1].startswith("start"):
                    rows.append((p[0], int(p[1]), int(p[2]), int(p[3]),
                                 int(p[4])))
        chroms = sorted({r[0] for r in rows})
        mats = {c: (self.reader.matrix("M" + c), self.reader.matrix("P" + c))
                for c in chroms}
        data = []
        for c, s1, e1, s2, e2 in rows:
            Mm, Pm = mats[c]
            m_if = float(Mm[s1 // self.res, e1 // self.res])
            p_if = float(Pm[s2 // self.res, e2 // self.res])
            data.append((c, s1, e1, s2, e2, m_if, p_if))
        return data

    def run(self, outfile: Optional[str] = None) -> List[tuple]:
        data = self._load()
        if outfile is None:
            d, b = os.path.split(self.loop_file)
            outfile = os.path.join(d, "Allelic_Specificity_" + b)
        m_if = np.array([d[5] for d in data])
        p_if = np.array([d[6] for d in data])
        mean = (m_if + p_if) // 2
        mean_nz = np.sort(mean[mean != 0])
        vmax = np.percentile(mean_nz, 95) if mean_nz.size else 0.0
        mask = ((m_if + p_if) / 2 <= vmax) & (m_if != 0) & (p_if != 0)
        kept = [d for d, k in zip(data, mask) if k]
        sum_m = sum(d[5] for d in kept)
        sum_t = sum(d[5] + d[6] for d in kept)
        p = sum_m / sum_t if sum_t else 0.0
        log.log(21, "loop specificity: %d/%d loops kept, maternal ratio %.4f",
                len(kept), len(data), p)

        results = []
        with open(outfile, "w") as out:
            out.write("\t".join(["chr", "startM", "endM", "startP", "endP",
                                 "M_IF", "P_IF", "QR", "Log2(FC)", "stat",
                                 "P_value"]) + "\n")
            for c, s1, e1, s2, e2, mi, pi in kept:
                tot = mi + pi
                stat = single_group_stat(p, mi, tot)
                if stat is None:
                    qr = fc = statv = pv = "NA"
                else:
                    pv = norm_sf(abs(stat)) * 2
                    qr = bisect.bisect_left(mean_nz, tot // 2) / len(mean_nz)
                    fc = float(np.log2(mi / (tot - mi)))
                    statv = stat
                row = (c, s1, e1, s2, e2, mi, pi, qr, fc, statv, pv)
                results.append(row)
                out.write("\t".join(map(str, row)) + "\n")
        return results

    Running = run  # reference method-name parity


# -------------------------------------------------------------- boundary
class BoundaryAllelicSpecificity:
    """Paired t-test of normalized inter-domain blocks around boundaries.

    ``boundary_file`` columns: chrom, M-boundary-bp, P-boundary-bp.
    """

    def __init__(self, cooler_fil: str, boundary_fil: str, res: int,
                 offset: int = 10):
        self.reader = CoolerReader(cooler_fil, res)
        self.res = res
        self.offset = offset
        self.boundary_file = boundary_fil

    @staticmethod
    def _sample(M: np.ndarray, b: int, off: int) -> np.ndarray:
        """Middle-block sample normalized by local background
        (AllelicSpecificity.py:294-315)."""
        up = M[b - off : b, b - off : b]
        down = M[b : b + off, b : b + off]
        middle = np.tril(M[b - off : b, b : b + off])
        nz = lambda a: a[np.nonzero(a)]
        u, d, m = nz(up), nz(down), nz(middle)
        denom = len(u) + len(d) + len(m)
        bg = (u.sum() + d.sum() + m.sum()) / denom if denom else 1.0
        return (middle / bg).reshape(-1)

    @staticmethod
    def _remove_gap(ms: np.ndarray, ps: np.ndarray):
        keep = (ms != 0) & (ps != 0)
        return ms[keep], ps[keep]

    def run(self, outfile: str) -> np.ndarray:
        rows = []
        with open(self.boundary_file) as f:
            for line in f:
                p = line.split()
                if len(p) >= 3:
                    rows.append((p[0], int(p[1]), int(p[2])))
        chroms = sorted({r[0] for r in rows})
        mats = {}
        for c in chroms:
            Mm = self.reader.matrix("M" + c)
            Pm = self.reader.matrix("P" + c)
            mats[c] = (Mm - np.diag(np.diagonal(Mm)),
                       Pm - np.diag(np.diagonal(Pm)))

        def too_sparse(s):
            return (s == 0).sum() / len(s) >= 0.85 if len(s) else True

        info, pvals = [], []
        for c, bp1, bp2 in rows:
            Mm, Pm = mats[c]
            mb, pb = bp1 // self.res, bp2 // self.res
            if mb == pb:
                ms = self._sample(Mm, mb, self.offset)
                ps = self._sample(Pm, pb, self.offset)
                if too_sparse(ms) or too_sparse(ps):
                    log.log(21, "boundary %s %d/%d skipped: too many zeros",
                            c, bp1, bp2)
                    continue
                m_mean, p_mean = ms.mean(), ps.mean()
                ms, ps = self._remove_gap(ms, ps)
                stat, p = _safe_ttest(ms, ps)
                info.append((c, bp1, bp2, m_mean, p_mean, stat, p))
                pvals.append(p)
            else:
                ms1 = self._sample(Mm, mb, self.offset)
                ps1 = self._sample(Pm, mb, self.offset)
                ms2 = self._sample(Mm, pb, self.offset)
                ps2 = self._sample(Pm, pb, self.offset)
                bad1 = too_sparse(ms1) or too_sparse(ps1)
                bad2 = too_sparse(ms2) or too_sparse(ps2)
                if bad1 and bad2:
                    log.log(21, "boundary %s %d/%d skipped: too many zeros",
                            c, bp1, bp2)
                    continue
                cands = []
                if not bad1:
                    a, b_ = self._remove_gap(ms1, ps1)
                    s, p = _safe_ttest(a, b_)
                    cands.append((p, a.mean(), b_.mean(), s))
                if not bad2:
                    a, b_ = self._remove_gap(ms2, ps2)
                    s, p = _safe_ttest(a, b_)
                    cands.append((p, a.mean(), b_.mean(), s))
                # reference rule: cand1 only when STRICTLY smaller
                # (AllelicSpecificity.py:370-384); min() kept cand1 on
                # ties and on NaN comparisons
                if len(cands) == 2:
                    chosen = cands[0] if cands[0][0] < cands[1][0] \
                        else cands[1]
                else:
                    chosen = cands[0]
                p, mm, pm, s = chosen
                info.append((c, bp1, bp2, mm, pm, s, p))
                pvals.append(p)

        qvals = bh_fdr(np.array(pvals)) if pvals else np.array([])
        results = [tuple(list(i) + [q]) for i, q in zip(info, qvals)]
        with open(outfile, "w") as o:
            o.write("\t".join(["chr", "boundaryM", "boundaryP", "M_mean",
                               "P_mean", "stat", "p_value", "q_value"]) + "\n")
            for r in results:
                o.write("\t".join(map(str, r)) + "\n")
        return results

    Running = run


# ----------------------------------------------------------- compartment
class CompartmentAllelicSpecificity:
    """Empirical test of per-bin M-vs-P PC1 sign flips.

    Background = all pairwise (M_i − P_j) differences over sign-discordant
    bins genome-wide (AllelicSpecificity.py:460-485)."""

    def __init__(self, maternal_pc: str, paternal_pc: str, res: int):
        self.m_pc = load_pc_track(maternal_pc)
        self.p_pc = load_pc_track(paternal_pc)
        self.res = res

    def _oriented(self):
        for chro in self.m_pc:
            m = self.m_pc[chro]
            p = self.p_pc[chro]
            r = np.corrcoef(m, p)[0][1]
            yield chro, (-m if r < 0 else m), p

    def run(self, outfile: str):
        m_cand, p_cand = [], []
        for chro, m, p in self._oriented():
            disc = m * p < 0
            m_cand.append(m[disc])
            p_cand.append(p[disc])
        m_cand = np.concatenate(m_cand) if m_cand else np.array([])
        p_cand = np.concatenate(p_cand) if p_cand else np.array([])
        nbg = len(m_cand) * len(p_cand)
        log.log(21, "compartment specificity: %d discordant bins, "
                "%d background pairs", len(m_cand), nbg)

        # rank of each query diff inside the implicit pairwise-difference
        # background WITHOUT materializing it: #{(i,j): m_i - p_j < d}
        # = sum_i #{j: p_j > m_i - d}, chunked so memory stays
        # O(queries x chunk) — the explicit outer product was O(n^2)
        # floats (0.8 GB at 10k discordant bins, OOM at finer tracks)
        p_sorted = np.sort(p_cand)

        def _pairs_below(diffs: np.ndarray) -> np.ndarray:
            out = np.zeros(len(diffs), np.int64)
            for s in range(0, len(m_cand), 1024):
                x = m_cand[None, s:s + 1024] - diffs[:, None]
                out += (len(p_sorted)
                        - np.searchsorted(p_sorted, x, side="right")).sum(1)
            return out

        info, pvals = [], []
        queries = []
        for chro, m, p in self._oriented():
            disc = np.flatnonzero(m * p < 0)
            for i in disc:
                diff = m[i] - p[i]
                info.append([chro, i * self.res, m[i], p[i], diff])
                queries.append(diff)
        if queries:
            fwd = _pairs_below(np.asarray(queries))
            for row, f in zip(info, fwd):
                idx = min(int(f), nbg - int(f))
                pv = idx / nbg if nbg else 1.0
                row.append(pv)
                pvals.append(pv)
        qv = bh_fdr(np.array(pvals)) if pvals else np.array([])
        results = [tuple(list(i) + [q]) for i, q in zip(info, qv)]
        with open(outfile, "w") as o:
            o.write("\t".join(["chr", "position", "PC-M", "PC-P", "diff",
                               "P_Value", "Q_Value"]) + "\n")
            for r in results:
                o.write("\t".join(map(str, r)) + "\n")
        return results

    Running = run
