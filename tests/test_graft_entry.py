"""__graft_entry__.entry() must stay jittable and finite (the driver
compile-checks it every round)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_runs_and_is_finite():
    import __graft_entry__ as g

    fn, args = g.entry()
    nor_mm, nor_pm, gm, gp = fn(*args)
    assert nor_mm.shape == args[0].shape
    assert np.isfinite(np.asarray(nor_mm)).all()
    assert np.isfinite(np.asarray(nor_pm)).all()
    # padded rows must be flagged gap in both masks (second chrom n < N)
    n2 = int(np.asarray(args[3])[1])
    assert np.asarray(gm)[1, n2:].all() and np.asarray(gp)[1, n2:].all()
