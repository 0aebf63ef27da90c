"""Compile-time-vs-N probe for the split 10M programs (CPU, local).

The 10M on-chip bench's wall is XLA compile: 1M fused ~200 s, 4M
~1360 s, 10M >8000 s (killed) through the remote-compile tunnel.  The
engine's programs lower to scale-invariant StableHLO
(tests/test_program_size.py), so any compile-time growth is inside
XLA's backend passes, not in program size.  This probe times
lower()+compile() of the two split programs (rebuild, K-step scan
block) on XLA:CPU at several N -- locally measurable without the chip.
If CPU compile is also superlinear in N we can bisect the pass locally
(XLA_FLAGS=--xla_cpu_... / pass timing); if it is flat, the wall is
specific to the tunnel's TPU compile service.

Usage: JAX_PLATFORMS=cpu python scripts/compile_scaling_probe.py [N ...]
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import argon_monte_carlo_tpu as amc
from argon_monte_carlo_tpu.engine import pairs_config_for

NS = [int(a) for a in sys.argv[1:]] or [1_000_000, 4_000_000, 10_000_000]
K = int(os.environ.get("BENCH_REBUILD_INTERVAL", 8))


def probe(n):
    eng = amc.EngineConfig(
        dtype="float32", broadphase="cells", steps_per_epoch=K,
        hist_flush_interval=1, narrowphase="pairs", rebuild_interval=K,
    )
    cfg = amc.temperature_pore_config(engine=eng).scaled_to(n)
    sim = amc.Simulation(amc.make_workload(cfg))
    pcfg = pairs_config_for(sim.workload)

    # Abstract inputs only -- no 10M buffers, no init compute.
    state_avals = jax.eval_shape(sim.workload.init_fn,
                                 jax.random.PRNGKey(0))
    measure_avals = jax.eval_shape(
        lambda: __import__(
            "argon_monte_carlo_tpu.engine", fromlist=["Measurements"]
        ).Measurements.zeros(
            cfg.engine.num_bins, jnp.dtype(cfg.engine.dtype),
            num_particles=cfg.num_molecules,
        )
    )
    plist_avals = jax.eval_shape(
        lambda: __import__(
            "argon_monte_carlo_tpu.ops.pairs", fromlist=["PairList"]
        ).PairList.init(cfg.num_molecules, sim._dgrid, pcfg,
                        jnp.dtype(cfg.engine.dtype))
    )
    key_aval = jax.ShapeDtypeStruct((2,), jnp.uint32)
    steps_aval = jax.ShapeDtypeStruct((K,), jnp.int32)
    flags_aval = jax.ShapeDtypeStruct((K,), jnp.bool_)

    out = {}
    t0 = time.time()
    lowered = sim._rebuild_jit.lower(state_avals, plist_avals,
                                     sim._dgrid)
    t1 = time.time()
    lowered.compile()
    t2 = time.time()
    out["rebuild_lower_s"] = t1 - t0
    out["rebuild_compile_s"] = t2 - t1
    print(f"N={n}: rebuild lower {t1-t0:.1f}s compile {t2-t1:.1f}s",
          flush=True)

    t0 = time.time()
    lowered = sim._run_epoch_grid.lower(
        state_avals, measure_avals, key_aval, steps_aval, flags_aval,
        sim._dgrid, plist_avals,
    )
    t1 = time.time()
    lowered.compile()
    t2 = time.time()
    out["block_lower_s"] = t1 - t0
    out["block_compile_s"] = t2 - t1
    print(f"N={n}: block   lower {t1-t0:.1f}s compile {t2-t1:.1f}s",
          flush=True)
    return out


if __name__ == "__main__":
    for n in NS:
        probe(n)
