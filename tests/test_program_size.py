"""The jitted engine programs must be scale-invariant graphs.

The 10M-particle compile path depends on it: grid tables ride as traced
ARGUMENTS (DeviceGrid data fields) and the rebuild sweep is chunked
under ``lax.scan``, so the StableHLO is the same graph at any N --
measured 0.11 MB (rebuild) / 0.32 MB (8-step block) at BOTH 1M and 10M.
A regression here (e.g. closure-capturing the neighbour table, which
text-embeds an N-scaled literal: measured 345 MB at 10M, or unrolling
the sweep chunks) silently multiplies remote-compile time by orders of
magnitude long before any test fails functionally.
"""

import jax.numpy as jnp
import numpy as np

import argon_monte_carlo_tpu as amc
from argon_monte_carlo_tpu.engine import Simulation


def _lowered_sizes(n):
    eng = amc.EngineConfig(dtype="float32", broadphase="cells",
                           steps_per_epoch=8, narrowphase="pairs",
                           rebuild_interval=4)
    cfg = amc.temperature_pore_config(engine=eng).scaled_to(n)
    sim = Simulation(amc.make_workload(cfg))
    state, measure, key = sim.init()
    plist = sim._init_aux(state)
    reb = sim._rebuild_jit.lower(state, plist, sim._dgrid).as_text()
    idxs = jnp.arange(4, dtype=jnp.int32)
    flags = np.zeros((4,), np.bool_)
    blk = sim._run_epoch_grid.lower(
        state, measure, key, idxs, flags, sim._dgrid, plist
    ).as_text()
    return reb, blk


def test_engine_programs_are_scale_invariant():
    reb_s, blk_s = _lowered_sizes(60_000)
    reb_l, blk_l = _lowered_sizes(480_000)
    for small, large, name in ((reb_s, reb_l, "rebuild"),
                               (blk_s, blk_l, "block")):
        ls, ll = small.count("\n"), large.count("\n")
        # Graph size must not scale with N (small drift from
        # layer-count-dependent constants is fine).
        assert ll < 1.2 * ls + 64, (name, ls, ll)
        # Byte size catches N-scaled literals baked into the text
        # (a closure-captured neighbour table is ~tens of MB).
        assert len(large) < 4 * len(small) + (1 << 20), (
            name, len(small), len(large))
