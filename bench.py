"""Benchmark harness: particle-steps/sec/chip on the north-star workload.

Runs the Temperature_Pore workload (the reference's final stage,
Temperature_Pore_MC.py) scaled to BENCH_PARTICLES molecules at ambient
density on the attached TPU chip, and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured throughput / the BASELINE.json north-star target
(1e9 particle-steps/sec/chip at 10M particles on v5e).  Extra context
fields are included after the required keys.
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_PARTICLES = int(os.environ.get("BENCH_PARTICLES", 1_000_000))
WARMUP_STEPS = int(os.environ.get("BENCH_WARMUP_STEPS", 20))
TIMED_STEPS = int(os.environ.get("BENCH_STEPS", 100))
NORTH_STAR = 1e9  # particle-steps/sec/chip (BASELINE.json north_star)


def main() -> int:
    import jax

    import argon_monte_carlo_tpu as amc

    eng = amc.EngineConfig(
        dtype="float32", broadphase="cells", steps_per_epoch=20,
        # Exact histogram semantics: benchmark the same program the
        # parity/golden runs validate (hist_flush_interval=1 measured
        # within noise of the lossy interval-8 variant on TPU).
        hist_flush_interval=1,
    )
    cfg = amc.temperature_pore_config(engine=eng).scaled_to(BENCH_PARTICLES)
    n = cfg.num_molecules
    print(f"bench: N={n} device={jax.devices()[0].device_kind} "
          f"warmup={WARMUP_STEPS} timed={TIMED_STEPS}", file=sys.stderr)

    workload = amc.make_workload(cfg)
    sim = amc.Simulation(workload)
    state, measure, key = sim.init()
    jax.block_until_ready(state.pos)

    t0 = time.time()
    state, measure, _ = sim.run(
        num_steps=WARMUP_STEPS, state=state, measure=measure, run_key=key
    )
    # Force a device->host pull: through this environment's TPU tunnel
    # block_until_ready returns EARLY (before compile+execution finish),
    # which previously leaked the multi-minute XLA compile tail into the
    # timed region and understated throughput ~4x (BENCH_r01 9.7e5 vs
    # the true 3.6e6).  A scalar read cannot complete before the warmup
    # epochs actually ran.
    _ = float(state.pos[0, 0])
    print(f"bench: warmup (incl. compile) {time.time()-t0:.1f}s",
          file=sys.stderr)

    t0 = time.time()
    state, measure, metrics = sim.run(
        num_steps=TIMED_STEPS, state=state, measure=measure, run_key=key,
        start_step=WARMUP_STEPS,
    )
    # Force a device->host pull: in this environment block_until_ready
    # can return before the tunneled device actually finishes, which
    # once inflated the reported throughput 16x.
    checksum = float(state.pos[:, 2].sum())
    elapsed = time.time() - t0

    value = n * TIMED_STEPS / elapsed
    result = {
        "metric": "particle-steps/sec/chip (Temperature_Pore, "
                  f"{BENCH_PARTICLES} particles)",
        "value": value,
        "unit": "particle-steps/sec/chip",
        "vs_baseline": value / NORTH_STAR,
        "particles": n,
        "timed_steps": TIMED_STEPS,
        "elapsed_sec": elapsed,
        "steps_per_sec": TIMED_STEPS / elapsed,
        "collisions": int(sim.finalize_measure(measure).collision_count),
        "checksum": checksum,
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
