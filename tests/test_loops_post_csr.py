"""The loops post stages (selection, clustering) run off the raw-matrix
cache, which round 3 narrowed from dense float64 to symmetric CSR —
these pin CSR == dense through the REAL file-driven entry points, so a
scipy indexing/diagonal behavior change cannot regress silently
(StructureFind.py:2063-2243 semantics)."""

import numpy as np

from hichap_master_tpu.models.loops import (_sym_csr, loop_cluster,
                                            loop_selecting)

RES = 10_000
HEAD = ("chromLabel\tloc_1\tloc_2\tIF\tD-Enrichment\tD-pvalue\tD-qvalue\t"
        "LL-Enrichment\tLL-pvalue\tLL-qvalue\n")


def _mats(rng, n=80):
    M = rng.poisson(3.0, (n, n)).astype(np.float64)
    i = np.arange(n)
    M = M * (np.abs(np.subtract.outer(i, i)) < 30)
    # a few strong peaks so selection keeps something
    for (a, b) in [(5, 12), (20, 33), (40, 47), (60, 71)]:
        M[a, b] = 200 + rng.integers(0, 50)
    M = np.triu(M) + np.triu(M, 1).T
    r, c = np.nonzero(np.triu(M))
    return M, (r, c, M[r, c])


def _candidates(path, rng, n=80, count=60):
    with open(path, "w") as f:
        f.write(HEAD)
        for _ in range(count):
            a = int(rng.integers(0, n - 12))
            b = a + int(rng.integers(2, 12))
            q = 10.0 ** -float(rng.uniform(4, 12))
            f.write(f"1\t{a * RES}\t{b * RES}\t0\t2.0\t{q}\t{q}\t"
                    f"2.0\t{q}\t{q}\n")
        # include the strong peaks themselves
        for (a, b) in [(5, 12), (20, 33), (40, 47), (60, 71)]:
            f.write(f"1\t{a * RES}\t{b * RES}\t0\t3.0\t1e-9\t1e-9\t"
                    f"3.0\t1e-9\t1e-9\n")


def test_cluster_aggregate_overflow_keeps_loop(tmp_path, rng):
    """A cluster aggregating 309+ candidates drives 10**sums past the
    float64 max: the reference's array arithmetic yields inf (wq -> 0,
    loop kept); Python-float pow raised OverflowError and killed the
    final stage (round-3 review find)."""
    M, (r, c, v) = _mats(rng)
    cand = tmp_path / "cand.txt"
    with open(cand, "w") as f:
        f.write(HEAD)
        for _ in range(400):  # all cluster to one centroid
            q = 1e-9
            f.write(f"1\t{5 * RES}\t{12 * RES}\t0\t3.0\t{q}\t{q}\t"
                    f"3.0\t{q}\t{q}\n")
    cache = {"1": _sym_csr(r, c, v, M.shape[0])}
    cluster = loop_cluster(cache, RES, str(cand), False)
    lines = open(cluster).read().splitlines()
    assert len(lines) == 2  # header + the kept (wq == 0.0) loop
    assert float(lines[1].split("\t")[4]) == 0.0


def test_selection_and_cluster_csr_matches_dense(tmp_path, rng):
    M, (r, c, v) = _mats(rng)
    cand = tmp_path / "cand.txt"
    _candidates(cand, rng)

    outs = {}
    for tag, cache in (("dense", {"1": M}),
                       ("csr", {"1": _sym_csr(r, c, v, M.shape[0])})):
        sel = tmp_path / f"sel_{tag}.txt"
        loop_selecting(cache, RES, str(cand), str(sel))
        cluster = loop_cluster(cache, RES, str(sel), False)
        outs[tag] = (sel.read_text(), open(cluster).read())

    assert outs["dense"][0] == outs["csr"][0]
    assert outs["dense"][1] == outs["csr"][1]
    # the selection kept the strong peaks (non-trivial output)
    assert len(outs["csr"][0].splitlines()) > 1
    assert len(outs["csr"][1].splitlines()) > 1
