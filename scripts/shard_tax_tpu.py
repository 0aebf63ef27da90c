"""Sharding tax ON THE TPU: mesh=1 sharded engine vs unsharded, same N.

VERDICT r4 item 7b: the sharded engine's overhead had only been
measured on the 1-core virtual CPU mesh (shard_scaling.py), where
timesharing conflates overhead with contention.  This runs BOTH
engines on the one real chip at the same scale, interleaved ABBA
(like scripts/ab_bench.py) so tunnel drift cancels, and reports the
tax = sharded_time / unsharded_time per paired epoch.

The mesh=1 sharded program still pays every structural cost of the
sharded design -- fixed-capacity lane padding, ghost-band
construction, psum ledgers, gid bookkeeping -- while its ppermute
degenerates to self-sends, so the ratio isolates the design tax from
real communication.

Usage (chip must be free):  python scripts/shard_tax_tpu.py \
    [runs/bench/shard_tax_tpu.json]
Env: TAX_PARTICLES (default 1_000_000), TAX_SPE (48), TAX_BLOCKS (2).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_T975 = [12.706, 4.303, 3.182, 2.776, 2.571, 2.447, 2.365, 2.306,
         2.262, 2.228]


def main() -> int:
    out_path = (sys.argv[1] if len(sys.argv) > 1
                else "runs/bench/shard_tax_tpu.json")
    n_target = int(os.environ.get("TAX_PARTICLES", 1_000_000))
    spe = int(os.environ.get("TAX_SPE", 48))
    n_blocks = int(os.environ.get("TAX_BLOCKS", 2))

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_CACHE_DIR",
            # In-repo default: survives host restarts via git commits
            # (see bench.py's cache-dir comment).
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "runs", "jax_cache_r5")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import argon_monte_carlo_tpu as amc
    from argon_monte_carlo_tpu.parallel.mesh import make_mesh
    from argon_monte_carlo_tpu.parallel.shard import ShardedSimulation

    t_start = time.time()

    def mark(msg):
        print(f"shard_tax: {msg} at +{time.time() - t_start:.1f}s",
              file=sys.stderr, flush=True)

    eng = amc.EngineConfig(
        dtype="float32", broadphase="cells", steps_per_epoch=spe,
        hist_flush_interval=1, narrowphase="pairs", rebuild_interval=8,
    )
    cfg = amc.temperature_pore_config(engine=eng).scaled_to(n_target)
    n = cfg.num_molecules
    mark(f"N={n} spe={spe} blocks={n_blocks} "
         f"device={jax.devices()[0].device_kind}")

    arms = {
        "U": {"sim": amc.Simulation(amc.make_workload(cfg))},
        "S": {"sim": ShardedSimulation(amc.make_workload(cfg),
                                       mesh=make_mesh(1))},
    }
    for name in ("U", "S"):
        arm = arms[name]
        sim = arm["sim"]
        state, measure, key = sim.init()
        jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
        mark(f"{name}: init done")
        t0 = time.time()
        state, measure, _ = sim.run(num_steps=spe, state=state,
                                    measure=measure, run_key=key)
        jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
        mark(f"{name}: warmup (incl. compile) {time.time() - t0:.1f}s")
        arm.update(state=state, measure=measure, key=key, step0=spe,
                   epochs=[])

    def timed(name):
        arm = arms[name]
        t0 = time.time()
        state, measure, _ = arm["sim"].run(
            num_steps=spe, state=arm["state"], measure=arm["measure"],
            run_key=arm["key"], start_step=arm["step0"])
        leaf = jax.tree_util.tree_leaves(state)[0]
        jax.block_until_ready(leaf)
        _ = float(jax.device_get(leaf).ravel()[0])  # tunnel sync
        dt = time.time() - t0
        arm.update(state=state, measure=measure)
        arm["step0"] += spe
        arm["epochs"].append(dt)
        mark(f"{name} epoch {dt:.3f}s ({n * spe / dt:.4g} ps/s)")
        return dt

    pairs = []
    for _ in range(n_blocks):
        u1 = timed("U"); s1 = timed("S")
        s2 = timed("S"); u2 = timed("U")
        pairs.append((u1, s1))
        pairs.append((u2, s2))

    ratios = [s / u for u, s in pairs]
    m = len(ratios)
    mean_r = sum(ratios) / m
    var_r = sum((r - mean_r) ** 2 for r in ratios) / max(m - 1, 1)
    half = (_T975[min(m - 1, len(_T975)) - 1]
            * math.sqrt(var_r / m)) if m > 1 else float("nan")
    tot_s = arms["S"]["sim"].finalize_measure(arms["S"]["measure"])

    result = {
        "metric": "mesh=1 sharded / unsharded epoch-time ratio on TPU "
                  f"(Temperature_Pore, {n_target} particles)",
        "particles": n,
        "steps_per_epoch": spe,
        "pairs": m,
        "epochs_unsharded_sec": [round(t, 4) for t in arms["U"]["epochs"]],
        "epochs_sharded_sec": [round(t, 4) for t in arms["S"]["epochs"]],
        "tax_ratio_mean": mean_r,
        "tax_ratio_ci95": [mean_r - half, mean_r + half],
        "sharded_overflow": int(tot_s.overflow_count),
        "sharded_errs": int(tot_s.err_count),
        "device": jax.devices()[0].device_kind,
        "elapsed_sec": round(time.time() - t_start, 1),
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in (
        "tax_ratio_mean", "tax_ratio_ci95", "pairs",
        "sharded_overflow", "sharded_errs")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
