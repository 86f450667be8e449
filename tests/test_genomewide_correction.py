"""Genome-wide haplotype correction parity vs the float64 oracle."""

import numpy as np
import jax.numpy as jnp

from hichap_master_tpu.core import Genome
from hichap_master_tpu.core.contacts import pad_to_bucket
from hichap_master_tpu.ops.correct import genomewide_alpha, genomewide_correction
from hichap_master_tpu.testing.oracles import (
    oracle_genomewide,
    synthetic_contact_matrix,
)


def test_genomewide_correction_matches_oracle(rng):
    g = Genome({"1": 500_000, "2": 400_000})
    res = 10_000
    hap = g.haplotype()
    S_tra = g.total_bins(res)
    S_hap = hap.total_bins(res)

    T = synthetic_contact_matrix(rng, S_tra, gap_frac=0.05, scale=60.0)
    H = np.zeros((S_hap, S_hap))
    # haplotype as noisy halves, plus asymmetric single-triangle imputation
    base = rng.binomial(np.tile(T, (2, 2)).astype(int), 0.3).astype(float)
    H = np.triu(base) + np.triu(rng.binomial(
        np.tile(T, (2, 2)).astype(int), 0.05).astype(float), 1).T

    offs_tra = g.bin_offsets(res)
    offs_hap = hap.bin_offsets(res)

    want = oracle_genomewide(offs_tra, offs_hap, T, H, g.labels)

    alphas = []
    for c in g.labels:
        s, e = offs_tra[c]
        n = e - s + 1
        N = pad_to_bucket(n)

        def pad(M):
            z = np.zeros((N, N), np.float64)
            z[:n, :n] = M
            return jnp.asarray(z)

        ms, me = offs_hap["M" + c]
        ps, pe = offs_hap["P" + c]
        a = genomewide_alpha(pad(T[s:e + 1, s:e + 1]),
                             pad(H[ms:me + 1, ms:me + 1]),
                             pad(H[ps:pe + 1, ps:pe + 1]), jnp.asarray(n))
        alphas.append(np.asarray(a)[:n])
    alpha_full = np.concatenate(alphas)
    alpha_full = np.concatenate([alpha_full, alpha_full])

    got = np.asarray(genomewide_correction(
        jnp.asarray(H), jnp.asarray(alpha_full), jnp.asarray(S_hap)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-10)
