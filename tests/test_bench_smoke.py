"""bench.py end-to-end smoke on CPU.

The driver records BENCH_r{N}.json from bench.py's single JSON line;
a harness regression (bad JSON, missing keys, a crash in the derived
metrics) would surface only at round end on real hardware.  Run the
script as a subprocess at tiny scale on the CPU backend and validate
the contract.
"""

import json
import os
import subprocess
import sys


def test_bench_script_prints_contract_json():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_PARTICLES"] = "20000"
    env["BENCH_SPE"] = "8"
    env["BENCH_WARMUP_STEPS"] = "8"
    env["BENCH_STEPS"] = "16"
    env["JAX_CACHE_DIR"] = os.path.expanduser("~/.cache/jax_argon_tests")
    # Exercise the self-deadline wrapper on the healthy path too: the
    # parent must forward the child's JSON line untouched.
    env["BENCH_SELF_DEADLINE"] = "590"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [repo, env.get("PYTHONPATH", "")] if p
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, text=True, timeout=600, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    result = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline",
                "elapsed_throughput", "pair_checks_per_sec",
                "collisions", "median_epoch_sec"):
        assert key in result, key
    assert result["value"] > 0
    assert result["unit"] == "particle-steps/sec/chip"
    assert result["particles"] == 20000 or result["particles"] == 19999
    assert result["collisions"] > 0


def test_bench_stale_fallback_contract():
    """When the TPU backend is down at bench time (Aug 17-18 2026
    outage: 24h+ of UNAVAILABLE client inits), bench.py must still emit
    one contract-valid JSON line -- the committed on-chip measurement,
    unmistakably labelled stale -- instead of exiting with nothing."""
    import bench

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = bench._emit_stale_fallback(RuntimeError("UNAVAILABLE"))
    assert rc == 0
    result = json.loads(buf.getvalue().strip().splitlines()[-1])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in result, key
    assert result["stale"] is True
    assert result["metric"].startswith("STALE")
    assert "UNAVAILABLE" in result["stale_reason"]
    assert result["stale_source"].startswith("runs/bench/")
    assert result["value"] > 0


def test_bench_probe_failure_bounds_to_stale_line():
    """A dead backend must resolve to the STALE contract line in
    bounded time (the in-process init can stall ~25 min; the probe
    subprocess is hard-deadlined).  JAX_PLATFORMS=tpu has no plugin in
    this image, so the probe fails fast and deterministically."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "tpu"
    env["BENCH_PROBE_TIMEOUT"] = "60"
    env["BENCH_PROBE_COOLDOWN"] = "1"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [repo, env.get("PYTHONPATH", "")] if p
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, text=True, timeout=300, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["stale"] is True
    assert "probe failed" in result["stale_reason"]
    assert result["value"] > 0


def test_bench_self_deadline_bounds_a_wedged_run_to_stale_line():
    """2026-08-19 failure shape: the backend probe succeeds in seconds
    while every compile RPC stalls indefinitely (wedged remote compile
    service).  The self-deadline watchdog must convert that hang into
    the STALE contract line instead of letting the driver's timeout
    record nothing.  A 1 s deadline expires deterministically (child
    interpreter start alone exceeds it)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_SELF_DEADLINE"] = "1"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [repo, env.get("PYTHONPATH", "")] if p
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, text=True, timeout=300, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["stale"] is True
    assert "self-deadline" in result["stale_reason"]
    assert result["value"] > 0
