"""Driver-contract tests: entry() compiles and runs; dryrun_multichip
exercises the full sharded step on the virtual CPU mesh."""

import numpy as np
import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    recon_new = np.asarray(out[0])
    assert recon_new.shape == args[0].shape
    assert np.all(np.isfinite(recon_new))
    assert np.isfinite(float(out[-2])) and np.isfinite(float(out[-1]))


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
