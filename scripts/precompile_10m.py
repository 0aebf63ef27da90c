"""Resumable large-N precompile: land the split programs in the cache.

The 10M bench's wall is XLA compile through the remote tunnel.  The
engine's split design gives exactly two big programs (the rebuild and
the <=K-step scan block); this script compiles THEM ONLY -- running
K steps end-to-end -- so each completed compile lands in the durable
persistent cache even if a later one stalls and the process dies.  A
subsequent bench.py run then loads everything from cache.

Usage: [BENCH_PARTICLES=10000000] python scripts/precompile_10m.py
"""
import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_CACHE_DIR",
        # In-repo default (git-committed by the queue): restarts restore
        # the machine from the last commit, so only the repo tree
        # survives -- see bench.py's cache-dir comment.
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "runs", "jax_cache_r5")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argon_monte_carlo_tpu as amc  # noqa: E402

N = int(os.environ.get("BENCH_PARTICLES", 10_000_000))
K = int(os.environ.get("BENCH_REBUILD_INTERVAL", 8))


def _env_bool(name, default):
    v = os.environ.get(name)
    if v is None or v == "":
        return default
    return v != "0"


def mark(msg):
    print(f"precompile: {msg} at +{time.time() - T0:.1f}s",
          file=sys.stderr, flush=True)


T0 = time.time()
# Mirror bench.py's lever-knob env block EXACTLY (same names, same
# defaults) so a queue that pins knobs via env precompiles the same
# programs bench.py will then load from cache -- and so flipping a
# config.py default mid-round cannot desync the two.
eng = amc.EngineConfig(
    dtype="float32", broadphase="cells", steps_per_epoch=K,
    hist_flush_interval=1, narrowphase="pairs", rebuild_interval=K,
    cell_capacity=(int(os.environ["BENCH_CELL_CAP"])
                   if os.environ.get("BENCH_CELL_CAP") else None),
    cell_occupancy=float(os.environ.get("BENCH_CELL_OCC", 11.0)),
    packed_layer_gather=_env_bool("BENCH_PACKED_LAYERS", True),
    rebuild_bf16_hittest=_env_bool("BENCH_BF16_HIT", False),
    rebuild_occupancy_skip=_env_bool("BENCH_OCC_SKIP", False),
    eager_rebuild=os.environ.get("BENCH_EAGER_REBUILD") == "1",
    split_rebuild_programs=os.environ.get("BENCH_SPLIT_REBUILD") == "1",
    max_block_steps=(int(os.environ["BENCH_MAX_BLOCK"])
                     if os.environ.get("BENCH_MAX_BLOCK") else None),
)
cfg = amc.temperature_pore_config(engine=eng).scaled_to(N)
mark(f"config N={cfg.num_molecules}")
sim = amc.Simulation(amc.make_workload(cfg))
state, measure, key = sim.init()
_ = float(state.pos[0, 0])
mark("init done (eager ops compiled)")
# One run of exactly K steps compiles the rebuild program, then the
# K-step scan block -- the same two programs bench.py's warmup needs.
state, measure, _ = sim.run(num_steps=K, state=state, measure=measure,
                            run_key=key)
_ = float(state.pos[0, 0])
mark("rebuild + block programs compiled and executed")
print("precompile: ok")
