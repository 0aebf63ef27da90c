"""Print sha256 of the split programs' StableHLO at a small N.

Used to prove that default-off knobs leave the DEFAULT path's traced
program byte-identical (compile-cache safety: the warming 10M cache
must survive engine-code commits until the north-star bench lands).

Usage: JAX_PLATFORMS=cpu python scripts/hlo_hash.py [N]
"""
import hashlib
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import argon_monte_carlo_tpu as amc
from argon_monte_carlo_tpu.engine import pairs_config_for

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
K = 8

eng = amc.EngineConfig(
    dtype="float32", broadphase="cells", steps_per_epoch=K,
    hist_flush_interval=1, narrowphase="pairs", rebuild_interval=K,
    fused_epoch_max_particles=0,  # force the split (10M) programs
)
cfg = amc.temperature_pore_config(engine=eng).scaled_to(N)
sim = amc.Simulation(amc.make_workload(cfg))
pcfg = pairs_config_for(sim.workload)

state_avals = jax.eval_shape(sim.workload.init_fn, jax.random.PRNGKey(0))
from argon_monte_carlo_tpu.engine import Measurements
from argon_monte_carlo_tpu.ops.pairs import PairList

measure_avals = jax.eval_shape(
    lambda: Measurements.zeros(cfg.engine.num_bins,
                               jnp.dtype(cfg.engine.dtype),
                               num_particles=cfg.num_molecules))
plist_avals = jax.eval_shape(
    lambda: PairList.init(cfg.num_molecules, sim._dgrid, pcfg,
                          jnp.dtype(cfg.engine.dtype)))
key_aval = jax.ShapeDtypeStruct((2,), jnp.uint32)
steps_aval = jax.ShapeDtypeStruct((K,), jnp.int32)
flags_aval = jax.ShapeDtypeStruct((K,), jnp.bool_)

reb = sim._rebuild_jit.lower(state_avals, plist_avals,
                             sim._dgrid).as_text()
blk = sim._run_epoch_grid.lower(
    state_avals, measure_avals, key_aval, steps_aval, flags_aval,
    sim._dgrid, plist_avals).as_text()
print(f"N={N}")
print(f"rebuild sha256={hashlib.sha256(reb.encode()).hexdigest()}")
print(f"block   sha256={hashlib.sha256(blk.encode()).hexdigest()}")
