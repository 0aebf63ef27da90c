"""On-chip probe: do reduced-effort compiler options ride the tunnel?

The 10M split-program compile exceeded 4 h twice on the remote TPU
compile service while XLA:CPU compiles the identical StableHLO in <9 s
(COMPONENTS.md "The 10M compile wall").  Effort-reducing compiler
options are the one client-side lever that serializes into the compile
request.  Before betting the overnight 10M attempt on them, this probe
verifies ON THE CHIP, at a tiny N (seconds of compile), that each
option set (a) is accepted by the axon/PJRT backend, (b) produces a
program whose physics counters match the default compile, and (c)
reports wall compile+run time for the record.

Writes one line per option set:  <tag> ok=<bool> compile_s=<t> ...

Usage (TPU free): python scripts/probe_compiler_options.py
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OPTION_SETS = {
    "plain": None,
    "effort_min": {
        "exec_time_optimization_effort": -1.0,
        "memory_fitting_effort": -1.0,
    },
    "effort_min_no_lhs": {
        "exec_time_optimization_effort": -1.0,
        "memory_fitting_effort": -1.0,
        "xla_tpu_enable_latency_hiding_scheduler": "false",
    },
}

CHILD = r"""
import json, os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_argon_optprobe"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, %(repo)r)
import argon_monte_carlo_tpu as amc
import numpy as np

eng = amc.EngineConfig(dtype="float32", broadphase="cells",
                       steps_per_epoch=8, hist_flush_interval=1,
                       narrowphase="pairs", rebuild_interval=8,
                       # force the SPLIT path (the 10M programs)
                       fused_epoch_max_particles=0)
cfg = amc.temperature_pore_config(engine=eng).scaled_to(50_000)
sim = amc.Simulation(amc.make_workload(cfg))
state, measure, key = sim.init()
_ = float(np.asarray(state.pos)[0, 0])
t0 = time.time()
state, measure, _ = sim.run(num_steps=8, state=state, measure=measure,
                            run_key=key)
_ = float(np.asarray(state.pos)[0, 0])
dt = time.time() - t0
print(json.dumps({
    "compile_run_s": round(dt, 2),
    "collisions": int(np.asarray(measure.collision_count)),
    "errs": int(np.asarray(measure.err_count)),
    "checksum": float(np.float64(np.asarray(state.pos).sum())),
}))
"""


def main():
    results = {}
    for tag, opts in OPTION_SETS.items():
        env = dict(os.environ)
        env.pop("ARGON_COMPILER_OPTIONS", None)
        if opts is not None:
            env["ARGON_COMPILER_OPTIONS"] = json.dumps(opts)
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-c", CHILD % {"repo": REPO}],
                env=env, capture_output=True, text=True, timeout=900,
            )
        except subprocess.TimeoutExpired:
            results[tag] = dict(ok=False, wall_s=round(time.time() - t0, 1),
                                error="timeout")
            print(f"{tag}: {json.dumps(results[tag])}", flush=True)
            continue
        wall = time.time() - t0
        line = (proc.stdout.strip().splitlines() or [""])[-1]
        try:
            payload = json.loads(line)
            ok = True
        except (ValueError, json.JSONDecodeError):
            payload = {"stderr_tail": proc.stderr.strip()[-400:]}
            ok = False
        results[tag] = dict(ok=ok, wall_s=round(wall, 1), **payload)
        print(f"{tag}: {json.dumps(results[tag])}", flush=True)

    base = results.get("plain", {})
    for tag, r in results.items():
        if tag == "plain" or not r.get("ok") or not base.get("ok"):
            continue
        match = (r.get("checksum") == base.get("checksum")
                 and r.get("collisions") == base.get("collisions"))
        print(f"{tag}: matches plain = {match}", flush=True)
    usable = [t for t, r in results.items()
              if t != "plain" and r.get("ok")]
    print(f"usable option sets: {usable}", flush=True)
    return 0 if usable else 1


if __name__ == "__main__":
    sys.exit(main())
