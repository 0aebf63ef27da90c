"""On-chip rebuild phase attribution at bench shapes.

The r4 fusion profile leaves ~50 ms/rebuild (`while.97`) unattributed
between the candidate sweep (`while.101`, 145 ms) and the fusion tail.
This times the rebuild's phases as separately-jitted programs at the
1M bench config so round-5 effort lands on the real term:

  table     assign_cells + build_cell_table
  sweep     cell_candidate_search (one-sided half-shell, active rows)
  rebuild   the full pairs_ops.rebuild (sweep + emission compaction)
  compactN  compact_indices over an N-wide mask (the `has` stage)
  compact4  compact_indices over an N*top_k-wide mask (entry stage)

Usage: [BENCH_PARTICLES=1000000] python scripts/profile_rebuild_phases.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import argon_monte_carlo_tpu as amc
from argon_monte_carlo_tpu.engine import (Simulation, build_grids,
                                          pairs_config_for)
from argon_monte_carlo_tpu.ops import collide, pairs as pairs_ops
from argon_monte_carlo_tpu.ops.compact import compact_indices

N = int(os.environ.get("BENCH_PARTICLES", 1_000_000))
K = int(os.environ.get("BENCH_REBUILD_INTERVAL", 8))


def timeit(label, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _ = float(jnp.asarray(
            jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
        best = min(best, time.time() - t0)
    print(f"{label:40s} {best * 1e3:8.2f} ms", flush=True)
    return best


eng = amc.EngineConfig(dtype="float32", broadphase="cells",
                       steps_per_epoch=K, hist_flush_interval=1,
                       narrowphase="pairs", rebuild_interval=K)
cfg = amc.temperature_pore_config(engine=eng).scaled_to(N)
wl = amc.make_workload(cfg)
sim = Simulation(wl)
_, dgrid = build_grids(wl)
pcfg = pairs_config_for(wl)
cr = cfg.physics.collision_range
dt = cfg.dt

state, measure, key = sim.init()
_ = float(state.pos[0, 0])
plist = sim._init_aux(state)
print(f"N={cfg.num_molecules} cap={dgrid.capacity} top_k={pcfg.top_k} "
      f"pair_cap={pcfg.pair_capacity}", flush=True)

max_reach = 0.5 * dgrid.cell_size
reach, _ = pairs_ops.reach_radii(state.vel, cr, dt, K, max_reach)

timeit("table (assign+build)", jax.jit(
    lambda pos: collide.build_cell_table(
        collide.assign_cells(pos, dgrid), dgrid)[0]), state.pos)
timeit("sweep (candidate search)", jax.jit(
    lambda pos, r: collide.cell_candidate_search(
        pos, dgrid, reach=r, top_k=pcfg.top_k, one_sided=True,
        half_shell=True)[0]), state.pos, reach)
timeit("rebuild (end-to-end)", jax.jit(
    lambda st, pl: pairs_ops.rebuild(st, dgrid, pcfg, cr, dt, pl).a),
    state, plist)

mask_n = (jnp.arange(cfg.num_molecules) % 3) == 0
timeit("compact_indices N-wide", jax.jit(
    lambda m: compact_indices(m, pcfg.pair_capacity,
                              cfg.num_molecules)), mask_n)
mk = pcfg.pair_capacity * pcfg.top_k
mask_mk = (jnp.arange(mk) % 5) == 0
timeit("compact_indices (pair_cap*top_k)-wide", jax.jit(
    lambda m: compact_indices(m, pcfg.pair_capacity, mk)), mask_mk)
print("done", flush=True)
