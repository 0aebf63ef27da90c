"""The driver entry points must always compile and run."""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    state = out[0]
    assert state.pos.shape == args[0].pos.shape


@pytest.mark.skipif(len(jax.devices()) < 4,
                    reason="needs the virtual multi-device mesh")
def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(4)
