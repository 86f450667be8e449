"""Plot CONTENT parity (not just existence): the arrays embedded in the
produced figures must equal the computed tracks — PC fill track + heatmap
(StructureFind.py:579-674), DI track + domain boxes (1345-1434), loop
markers on heatmaps (2259-2337)."""

import numpy as np
import pytest

from hichap_master_tpu.core import Genome
from hichap_master_tpu.io import CoolerReader, write_cooler

RES = 40_000


@pytest.fixture
def captured_figs(monkeypatch):
    """Record every figure handed to PdfPages.savefig (still written)."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib.backends.backend_pdf import PdfPages

    figs = []
    orig = PdfPages.savefig

    def spy(self, figure=None, **kw):
        figs.append(figure)
        return orig(self, figure, **kw)

    monkeypatch.setattr(PdfPages, "savefig", spy)
    return figs


@pytest.fixture
def cool(tmp_path, rng):
    g = Genome({"1": 4_000_000})
    n = g.n_bins("1", RES)
    i = np.arange(n)
    d = np.abs(np.subtract.outer(i, i)) + 1.0
    lam = 60.0 / d**0.8
    same = np.equal.outer(i // 20, i // 20)
    M = rng.poisson(lam * np.where(same, 4.0, 1.0)).astype(np.float32)
    M = np.triu(M) + np.triu(M, 1).T
    path = str(tmp_path / "p.cool")
    write_cooler(path, g, RES, {"1": M})
    r = CoolerReader(path, RES)
    r.set_weights(np.ones(r.nbins))
    return path


def _fill_track(ax, n):
    """Reconstruct the plotted signal from the fill_between collections:
    per integer x, the max-|y| vertex (baseline contributes 0)."""
    ys = np.zeros(n)
    for coll in ax.collections:
        for path in coll.get_paths():
            for x, y in path.vertices:
                xi = int(round(x))
                if 0 <= xi < n and abs(y) > abs(ys[xi]):
                    ys[xi] = y
    return ys


def test_compartment_plot_content(cool, tmp_path, captured_figs):
    from hichap_master_tpu.models.compartment import run_compartment

    tracks = run_compartment(cool, RES, False, str(tmp_path / "PC"),
                             plot=True)
    assert len(captured_figs) == 1
    fig = captured_figs[0]
    ax_sig, ax = fig.axes
    sig = tracks["1"]
    # heatmap array == the raw matrix the reference plots in IF mode
    M = CoolerReader(cool, RES).matrix("1", balance=False)
    np.testing.assert_allclose(np.asarray(ax.images[0].get_array()), M)
    # PC fill track == the computed PC values wherever nonzero
    got = _fill_track(ax_sig, len(sig))
    nz = sig != 0
    assert nz.any()
    np.testing.assert_allclose(got[nz], sig[nz], rtol=1e-6, atol=1e-9)


def test_tads_plot_content(cool, tmp_path, captured_figs):
    from hichap_master_tpu.models.tads import run_tads

    results = run_tads(cool, RES, False, str(tmp_path / "TAD"), plot=True)
    assert len(captured_figs) == 1
    fig = captured_figs[0]
    ax_di, ax = fig.axes
    di = results["1"]["di"]
    got = _fill_track(ax_di, len(di))
    nz = di != 0
    assert nz.any()
    np.testing.assert_allclose(got[nz], di[nz], rtol=1e-6, atol=1e-9)
    # every called domain appears as a box at its exact bin coordinates
    ds, de = results["1"]["domains"]
    assert len(ds), "degenerate case: no domains called"
    boxes = {tuple(ln.get_xdata()) for ln in ax.lines
             if len(ln.get_xdata()) == 5}
    for s, e in zip(ds, de):
        sb, eb = s // RES, e // RES
        assert (sb, eb, eb, sb, sb) in boxes
    assert len(boxes) == len(ds)


def test_loops_plot_content(cool, tmp_path, captured_figs):
    from hichap_master_tpu.models.loops import plot_loops

    loops = [("1", 20 * RES, 60 * RES), ("1", 10 * RES, 80 * RES)]
    cluster = tmp_path / "Cluster_Loops.txt"
    cluster.write_text(
        "chromLabel\tloc_1\tloc_2\n"
        + "".join(f"{c}\t{a}\t{b}\n" for c, a, b in loops))
    M = CoolerReader(cool, RES).matrix("1", balance=False)
    plot_loops(str(tmp_path / "L.pdf"), cool, RES, False, str(cluster),
               {"1": M})
    assert len(captured_figs) == 1
    ax = captured_figs[0].axes[0]
    offsets = np.vstack([c.get_offsets() for c in ax.collections])
    # markers at the pixel CENTER: imshow with no extent centers cell k
    # at coordinate k (the reference's +0.5 belonged with extent=(0, N))
    want = np.asarray([[a // RES, b // RES] for _, a, b in loops])
    got = offsets[np.lexsort(offsets.T[::-1])]
    want = want[np.lexsort(want.T[::-1])]
    np.testing.assert_allclose(got, want)
