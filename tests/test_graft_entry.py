"""Driver entry points must stay importable and runnable."""
import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def test_entry_compiles_and_converges():
    import __graft_entry__ as g
    fn, args = g.entry()
    x, conv = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(x)).all()
    assert bool(conv)


def test_dryrun_multichip_two_devices():
    import __graft_entry__ as g
    g.dryrun_multichip(2)
