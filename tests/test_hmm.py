"""GMM-HMM: Baum-Welch learning, Viterbi decoding, structural-zero safety."""

import numpy as np
import pytest

from hichap_master_tpu.ops.hmm import GMMHMM, baum_welch, viterbi


def _gen_hmm_data(rng, A, pi, means, sds, n_seqs=30, T=80):
    S = len(pi)
    seqs, paths = [], []
    for _ in range(n_seqs):
        s = rng.choice(S, p=pi)
        xs, ss = [], []
        for _ in range(T):
            ss.append(s)
            xs.append(rng.normal(means[s], sds[s]))
            s = rng.choice(S, p=A[s])
        seqs.append(np.array(xs))
        paths.append(np.array(ss))
    return seqs, paths


def test_baum_welch_increases_loglik_and_recovers_means(rng):
    A = np.array([[0.9, 0.1], [0.2, 0.8]])
    pi = np.array([0.6, 0.4])
    seqs, _ = _gen_hmm_data(rng, A, pi, means=[-2.0, 3.0], sds=[1.0, 1.0])
    init = GMMHMM(
        A=np.array([[0.5, 0.5], [0.5, 0.5]]),
        pi=np.array([0.5, 0.5]),
        means=np.array([[-1.0, 0.0], [1.0, 2.0]]),
        varis=np.ones((2, 2)) * 2.0,
        weights=np.ones((2, 2)) * 0.5,
    )
    trained, hist = baum_welch(init, seqs, max_iters=200)
    assert len(hist) > 2
    diffs = np.diff(hist)
    assert (diffs > -1e-6).all(), "log-likelihood must be non-decreasing"
    # state-level effective means (mixture-weighted)
    eff = (trained.means * trained.weights).sum(1)
    eff.sort()
    assert abs(eff[0] - (-2.0)) < 0.4
    assert abs(eff[1] - 3.0) < 0.4


def test_structural_zeros_preserved(rng):
    A = np.array([[0.0, 1.0, 0.0], [0.3, 0.4, 0.3], [0.5, 0.0, 0.5]])
    pi = np.array([0.0, 0.5, 0.5])
    seqs, _ = _gen_hmm_data(rng, A, pi, means=[-3.0, 0.0, 3.0],
                            sds=[1, 1, 1], n_seqs=10, T=60)
    init = GMMHMM(A=A.copy(), pi=pi.copy(),
                  means=np.array([[-2.0, -1], [0.0, 0.5], [2.0, 3.0]]),
                  varis=np.ones((3, 2)),
                  weights=np.ones((3, 2)) / 2)
    trained, _ = baum_welch(init, seqs, max_iters=50)
    assert trained.A[0, 0] == 0 and trained.A[0, 2] == 0
    assert trained.A[2, 1] == 0
    assert trained.pi[0] == 0
    np.testing.assert_allclose(trained.A.sum(1), 1.0, atol=1e-9)


def test_viterbi_recovers_well_separated_states(rng):
    A = np.array([[0.95, 0.05], [0.05, 0.95]])
    pi = np.array([0.5, 0.5])
    seqs, paths = _gen_hmm_data(rng, A, pi, means=[-4.0, 4.0], sds=[0.7, 0.7],
                                n_seqs=8, T=100)
    model = GMMHMM(A=A, pi=pi,
                   means=np.array([[-4.0, -4.0], [4.0, 4.0]]),
                   varis=np.ones((2, 2)) * 0.49,
                   weights=np.ones((2, 2)) / 2)
    out = viterbi(model, seqs)
    for (path, lp), truth in zip(out, paths):
        assert len(path) == len(truth)
        acc = (path == truth).mean()
        assert acc > 0.95, f"viterbi accuracy {acc}"
        assert np.isfinite(lp)


def test_viterbi_ragged_lengths(rng):
    model = GMMHMM(
        A=np.array([[0.8, 0.2], [0.2, 0.8]]), pi=np.array([0.5, 0.5]),
        means=np.array([[-1.0, -1.0], [1.0, 1.0]]),
        varis=np.ones((2, 2)), weights=np.ones((2, 2)) / 2)
    seqs = [rng.normal(size=l) for l in (3, 17, 50)]
    out = viterbi(model, seqs)
    assert [len(p) for p, _ in out] == [3, 17, 50]


def test_hichap_3state_prior_roundtrip(rng):
    """The reference's hand-tuned 3-state prior trains without NaNs on
    DI-like data (StructureFind.py:918-956)."""
    A = [[0.85, 0.15, 0.00], [0.05, 0.80, 0.15], [0.19, 0.01, 0.80]]
    pi = [0.40, 0.30, 0.30]
    numdists = 3
    var = 6.0 / (numdists - 1)
    means = [[(i + 1) * var for i in range(3)],
             [(i - 1) * var for i in range(3)],
             [(i - 2) * var for i in range(3)]]
    B = [[means[s], [var] * 3, [1.0 / 3] * 3] for s in range(3)]
    model = GMMHMM.from_reference_B(A, B, pi)
    seqs = [np.concatenate([rng.normal(3, 1, 20), rng.normal(0, 1, 20),
                            rng.normal(-3, 1, 20)]) for _ in range(6)]
    trained, hist = baum_welch(model, seqs, max_iters=100)
    assert np.isfinite(trained.A).all()
    assert np.isfinite(trained.means).all()
    assert (trained.varis > 0).all()
    assert trained.A[0, 2] == 0.0  # structural zero of the prior
    out = viterbi(trained, seqs)
    assert all(np.isfinite(lp) for _, lp in out)


def test_fused_em_matches_host_loop(rng):
    from hichap_master_tpu.ops.hmm import baum_welch_fused

    A = np.array([[0.9, 0.1], [0.2, 0.8]])
    pi = np.array([0.6, 0.4])
    seqs, _ = _gen_hmm_data(rng, A, pi, means=[-2.0, 3.0], sds=[1.0, 1.0],
                            n_seqs=10, T=60)
    init = GMMHMM(
        A=np.array([[0.5, 0.5], [0.5, 0.5]]),
        pi=np.array([0.5, 0.5]),
        means=np.array([[-1.0, 0.0], [1.0, 2.0]]),
        varis=np.ones((2, 2)) * 2.0,
        weights=np.ones((2, 2)) * 0.5,
    )
    host, hist = baum_welch(init, seqs, max_iters=100)
    fused, iters, ll = baum_welch_fused(init, seqs, max_iters=100)
    np.testing.assert_allclose(fused.A, host.A, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(fused.means, host.means, rtol=1e-6)
    np.testing.assert_allclose(fused.pi, host.pi, rtol=1e-6, atol=1e-9)
    assert abs(iters - len(hist)) <= 1
