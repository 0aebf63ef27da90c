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
# Epoch length: a multiple of the K=8 rebuild interval so the pairs
# engine compiles exactly ONE scan-block length (engine.py splits each
# epoch into K-step blocks between separately-jitted rebuilds).
STEPS_PER_EPOCH = int(os.environ.get("BENCH_SPE", 48))
WARMUP_STEPS = int(os.environ.get("BENCH_WARMUP_STEPS", STEPS_PER_EPOCH))
# 5 timed epochs: with 2, sorted()[len//2] lands on the WORSE epoch, and
# identical epochs vary up to ~3x through the TPU tunnel (the 2026-08-19
# 1M run recorded 2.02e7 from epochs [2.38s, 1.88s] where the committed
# half-shell run had measured 2.55e7).  Five epochs cost ~10 s at 1M
# against a multi-minute compile and give a true middle value.
TIMED_STEPS = int(os.environ.get("BENCH_STEPS", 5 * STEPS_PER_EPOCH))
NORTH_STAR = 1e9  # particle-steps/sec/chip (BASELINE.json north_star)


def _env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None or v == "":
        return default
    return v != "0"


def _emit_stale_fallback(err: Exception) -> int:
    """Last resort when the tunneled TPU grant is down at bench time
    (e.g. the Aug 17-18 2026 outage: every client init stalled ~25 min
    then failed UNAVAILABLE for 24h+).  Instead of exiting with no
    number, emit the most recent COMMITTED on-chip measurement of this
    workload, unmistakably labelled stale -- the value was measured on
    the same chip, just not at bench time.

    Exit code: 0 by default (the driver's end-of-round run must record
    SOMETHING), but BENCH_STALE_EXIT_NONZERO=1 makes it 3 so queue
    scripts that gate on rc never commit a stale line as a landed
    measurement (ADVICE r4 high: a stale fallback once risked being
    mv'd into a lever artifact and skipping that lever forever)."""
    # Default: the most recent committed on-chip measurement of the
    # SHIPPING program (ADVICE r3: the halfshell artifact predates the
    # active-cells sweep and would overstate an outage fallback ~26%).
    here = os.path.dirname(os.path.abspath(__file__))
    default = os.path.join(here, "runs", "bench", "bench_1m_r4b.json")
    for name in ("bench_1m_r5.json",):
        cand = os.path.join(here, "runs", "bench", name)
        if os.path.exists(cand):
            default = cand
            break
    path = os.environ.get("BENCH_STALE_SOURCE", default)
    try:
        with open(path) as f:
            committed = json.load(f)
    except OSError:
        raise err
    committed["metric"] = ("STALE -- TPU backend UNAVAILABLE at bench "
                           "time; committed on-chip measurement: "
                           + committed["metric"])
    committed["stale"] = True
    committed["stale_reason"] = str(err)
    committed["stale_source"] = os.path.relpath(
        path, os.path.dirname(os.path.abspath(__file__)))
    # The fallback must still carry the north-star-scale number when
    # one exists: the committed 1M artifact predates any 10M landing,
    # so attach the same cross-reference the live path adds.
    _attach_committed_10m(committed,
                          particles=committed.get("particles", 0))
    print("bench: emitting committed measurement as STALE fallback "
          f"({path})", file=sys.stderr, flush=True)
    print(json.dumps(committed))
    return 3 if os.environ.get("BENCH_STALE_EXIT_NONZERO") == "1" else 0


def _attach_committed_10m(result: dict, particles: int) -> None:
    """Cross-reference the committed 10M north-star measurement when
    this result was taken at another scale (VERDICT r3 item 1): the
    north star is defined at 10M particles, so the judge-facing JSON
    carries both numbers."""
    if particles == 10_000_000:
        return
    here = os.path.dirname(os.path.abspath(__file__))
    for name in ("bench_10m_r5.json", "bench_10m_r4.json"):
        p10 = os.path.join(here, "runs", "bench", name)
        if os.path.exists(p10):
            break
    try:
        with open(p10) as f:
            c10 = json.load(f)
        if "value" in c10:
            result["committed_10m"] = {
                k: c10[k] for k in (
                    "value", "unit", "vs_baseline", "particles",
                    "median_epoch_sec", "device",
                ) if k in c10
            }
            result["committed_10m"]["source"] = os.path.relpath(
                p10, os.path.dirname(os.path.abspath(__file__)))
    except (OSError, ValueError):
        pass


def _self_deadline_guard() -> int | None:
    """Watchdog against a WEDGED remote compile service.

    The backend probe catches a dead tunnel, but 2026-08-19 showed a
    second failure shape: jax.devices() answers in seconds while every
    compile RPC stalls indefinitely (two killed 10M precompiles left
    the remote service crawling -- cached 10M init ops that had
    compiled in 263 s would not even replay in 20 min).  A bench run
    that hangs inside XLA compile past the driver's own timeout
    records NOTHING (the r3 0-byte 10M artifact).  So the measurement
    runs in a child process under a hard deadline; on expiry the
    parent emits the committed stale fallback instead of nothing.

    Returns None when this IS the child (or the guard is disabled):
    proceed with the real measurement.  Otherwise returns the exit
    code to use.  Default deadline 2400 s (a healthy cold 1M run is
    ~20 min incl. the ~14 min fused compile) up to 2M particles; at
    larger N a cold remote compile legitimately takes hours (ADVICE
    r4: a healthy uncached 10M run must not be killed mid-compile by
    a 1M-sized default), so the default DISABLES the guard and large-N
    queues must set BENCH_SELF_DEADLINE explicitly.  0 disables; CPU
    runs (tests) default to disabled.

    The child runs in its own process group and the parent forwards
    SIGTERM/SIGINT to that group, so an outer ``timeout`` killing the
    parent can no longer orphan a grandchild that keeps a wedged
    compile RPC holding the single TPU grant (ADVICE r4 medium).
    """
    if os.environ.get("BENCH_CHILD") == "1":
        return None
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        default = 0
    else:
        default = 2400 if BENCH_PARTICLES <= 2_000_000 else 0
    try:
        deadline = int(os.environ.get("BENCH_SELF_DEADLINE") or default)
    except ValueError:
        print(f"bench: invalid BENCH_SELF_DEADLINE "
              f"{os.environ.get('BENCH_SELF_DEADLINE')!r}; using default "
              f"{default}", file=sys.stderr, flush=True)
        deadline = default
    if deadline <= 0:
        if os.environ.get("JAX_PLATFORMS", "") != "cpu":
            print("bench: self-deadline guard disabled "
                  f"(N={BENCH_PARTICLES})", file=sys.stderr, flush=True)
        return None
    print(f"bench: self-deadline {deadline}s (N={BENCH_PARTICLES})",
          file=sys.stderr, flush=True)
    import signal
    import subprocess
    env = dict(os.environ, BENCH_CHILD="1")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)], env=env,
        stdout=subprocess.PIPE, text=True, start_new_session=True,
    )

    def _kill_child_group(*_args):
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass

    # An outer `timeout`/driver kill of THIS process must take the
    # child's whole group with it (the wedged compile RPC lives there).
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda *_a: (_kill_child_group(), sys.exit(124)))
    try:
        stdout, _ = proc.communicate(timeout=deadline)
    except subprocess.TimeoutExpired:
        _kill_child_group()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            pass
        return _emit_stale_fallback(RuntimeError(
            f"self-deadline {deadline}s exceeded -- backend answered "
            "the liveness probe but the measurement never finished "
            "(wedged remote compile service?)"))
    lines = [ln for ln in (stdout or "").splitlines() if ln.strip()]
    if proc.returncode == 0 and lines:
        # Forward only a valid JSON contract line (ADVICE r4 low: any
        # stray non-JSON stdout with rc=0 was forwarded verbatim).
        try:
            json.loads(lines[-1])
        except ValueError:
            return _emit_stale_fallback(RuntimeError(
                "bench child rc=0 but last stdout line is not JSON: "
                + lines[-1][:200]))
        print(lines[-1])
        return 0
    return _emit_stale_fallback(RuntimeError(
        f"bench child exited rc={proc.returncode} "
        f"{'with no output' if not lines else 'without valid output'}"))


def _backend_probe_ok() -> tuple[bool, str]:
    """Bounded backend liveness probe in a SUBPROCESS.

    During the Aug 2026 outage a dead tunnel stalled ~25 min per
    in-process client init, so the path to the stale fallback was two
    stalls plus a 600 s cooldown (~60 min) -- long enough to risk the
    driver's own timeout recording NOTHING.  A healthy init completes
    in well under a minute, so probing in a throwaway subprocess with a
    hard deadline bounds the dead-tunnel path to ~12 min while leaving
    the healthy path untouched.  Disabled on the CPU backend (tests)
    or with BENCH_PROBE_TIMEOUT=0.
    """
    import subprocess
    timeout = int(os.environ.get("BENCH_PROBE_TIMEOUT", 420))
    if timeout <= 0 or os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return True, "probe disabled"
    code = "import jax; print(jax.devices()[0].device_kind)"
    reason = "unknown"
    for attempt in (1, 2):
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], timeout=timeout,
                capture_output=True, text=True,
            )
            if out.returncode == 0:
                return True, out.stdout.strip()
            tail = (out.stderr or "").strip().splitlines()
            reason = tail[-1] if tail else f"probe rc={out.returncode}"
        except subprocess.TimeoutExpired:
            reason = f"probe timeout after {timeout}s"
        print(f"bench: backend probe attempt {attempt} failed after "
              f"{time.time()-t0:.0f}s ({reason})",
              file=sys.stderr, flush=True)
        if attempt == 1:
            time.sleep(int(os.environ.get("BENCH_PROBE_COOLDOWN", 180)))
    return False, reason


def main() -> int:
    guard_rc = _self_deadline_guard()
    if guard_rc is not None:
        return guard_rc
    ok, why = _backend_probe_ok()
    if not ok:
        return _emit_stale_fallback(
            RuntimeError(f"backend liveness probe failed: {why}")
        )

    import jax

    # Persistent compile cache: XLA compiles through this environment's
    # remote-compile tunnel take minutes (1M) to hours (10M); cached
    # executables load in seconds on repeat runs of the same program.
    # Durable default = IN-REPO and git-committed (queue_r5e commits it
    # after every precompile attempt): the 2026-08-19 restart wiped
    # /tmp, and the 2026-08-20 restart showed $HOME does not survive
    # either -- the machine restores from the last git commit, so the
    # repo tree is the only storage that outlives a restart.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "runs", "jax_cache_r5")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import argon_monte_carlo_tpu as amc

    eng = amc.EngineConfig(
        dtype="float32", broadphase="cells",
        steps_per_epoch=STEPS_PER_EPOCH,
        # Exact histogram semantics: benchmark the same program the
        # parity/golden runs validate (hist_flush_interval=1 measured
        # within noise of the lossy interval-8 variant on TPU).
        hist_flush_interval=1,
        # Verlet reach-pair narrow phase (ops/pairs.py): bitwise-equal
        # trajectories to the per-step sweep (tests/test_pairs.py), the
        # full neighbour sweep amortized over 8 steps.
        narrowphase=os.environ.get("BENCH_NARROWPHASE", "pairs"),
        rebuild_interval=int(os.environ.get("BENCH_REBUILD_INTERVAL", 8)),
        # Grid-shape sweep knobs: the rebuild sweep's dominant VPU term
        # scales ~rows * cap^2 while spill-to-hot keeps ANY capacity
        # coverage-exact (tests/test_pairs.py forced-starvation at cap
        # 4) and pairs_config_for grows the research budgets to absorb
        # the thinner Poisson tail.  Defaults (occ 11 -> cap 24) are
        # the shipping config; BENCH_CELL_CAP/BENCH_CELL_OCC measure
        # alternatives on-chip without a code change.
        cell_capacity=(int(os.environ["BENCH_CELL_CAP"])
                       if os.environ.get("BENCH_CELL_CAP") else None),
        cell_occupancy=float(os.environ.get("BENCH_CELL_OCC", 11.0)),
        # Rebuild levers (see EngineConfig docstrings for the r4
        # measurements that set each default; unset env inherits the
        # shipping default so the driver's bare run measures exactly
        # the configuration a user gets).
        packed_layer_gather=_env_bool("BENCH_PACKED_LAYERS", True),
        rebuild_bf16_hittest=_env_bool("BENCH_BF16_HIT", False),
        rebuild_occupancy_skip=_env_bool("BENCH_OCC_SKIP", False),
        eager_rebuild=os.environ.get("BENCH_EAGER_REBUILD") == "1",
        split_rebuild_programs=(
            os.environ.get("BENCH_SPLIT_REBUILD") == "1"),
        max_block_steps=(int(os.environ["BENCH_MAX_BLOCK"])
                         if os.environ.get("BENCH_MAX_BLOCK") else None),
    )
    cfg = amc.temperature_pore_config(engine=eng).scaled_to(BENCH_PARTICLES)
    n = cfg.num_molecules
    try:
        device_kind = jax.devices()[0].device_kind
    except RuntimeError as e:
        # The tunnel's TPU client occasionally comes up wedged
        # (UNAVAILABLE after a ~25 min init stall) -- a killed prior
        # process can hold the single grant for a while.  The failure
        # is cached per-process by jax, so retry by RE-EXEC after a
        # cooldown, once.
        if os.environ.get("BENCH_BACKEND_RETRIED") == "1":
            return _emit_stale_fallback(e)
        print(f"bench: backend init failed ({e}); retrying once in "
              f"600s via re-exec", file=sys.stderr, flush=True)
        time.sleep(600)
        env = dict(os.environ, BENCH_BACKEND_RETRIED="1")
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
    print(f"bench: N={n} device={device_kind} "
          f"warmup={WARMUP_STEPS} timed={TIMED_STEPS}", file=sys.stderr)

    workload = amc.make_workload(cfg)
    sim = amc.Simulation(workload)
    t0 = time.time()
    state, measure, key = sim.init()
    jax.block_until_ready(state.pos)
    _ = float(state.pos[0, 0])
    # Phase marks: at 10M the warmup phase is tens of minutes of remote
    # compile; stamping init/warmup separately makes a stalled attempt
    # diagnosable from the log (r3's 10M log showed only "warmup=...").
    print(f"bench: init done in {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)

    # Derived pair-check rate (BASELINE.md tracked metric): exact
    # narrow-phase tests per step = the listed-pair buffer width (every
    # entry is one d^2 < cr^2 test), plus the rebuild sweep's hit-test
    # lanes amortized over the K-step window (pairs mode; the sweep
    # engine re-tests its full lane volume every step).
    if eng.narrowphase == "pairs":
        from argon_monte_carlo_tpu.engine import pairs_config_for
        pcfg = pairs_config_for(workload)
        g = sim._hgrid
        rows = (g.active_cells.shape[0] if g.active_cells is not None
                else g.num_cells)
        sweep_lanes = rows * g.capacity * 14 * g.capacity
        checks_per_step = (pcfg.pair_capacity
                           + sweep_lanes / max(eng.rebuild_interval, 1))
    else:
        g = sim._hgrid
        checks_per_step = g.num_cells * g.capacity * 27 * g.capacity

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

    # Time each epoch with a full device->host sync (a scalar pull; in
    # this environment block_until_ready can return before the tunneled
    # device finishes, which once inflated throughput 16x) and report
    # the MEDIAN epoch: single-epoch wall times through the tunnel vary
    # up to 3x run-to-run (observed 10.4s vs 3.7s for identical epochs).
    spe = eng.steps_per_epoch
    n_epochs = max(TIMED_STEPS // spe, 1)
    epoch_times = []
    step0 = WARMUP_STEPS
    t_all = time.time()
    for e in range(n_epochs):
        t0 = time.time()
        state, measure, metrics = sim.run(
            num_steps=spe, state=state, measure=measure, run_key=key,
            start_step=step0,
        )
        checksum = float(state.pos[:, 2].sum())
        epoch_times.append(time.time() - t0)
        step0 += spe
        print(f"bench: epoch {e}: {epoch_times[-1]:.2f}s "
              f"({n*spe/epoch_times[-1]:.3g} ps/s)", file=sys.stderr)
    elapsed = time.time() - t_all
    median = sorted(epoch_times)[len(epoch_times) // 2]

    # Headline = median synced epoch (identical epochs vary up to ~3x
    # through the TPU tunnel); the elapsed-based sustained aggregate is
    # reported alongside (ADVICE r2).
    value = n * spe / median
    result = {
        "metric": "particle-steps/sec/chip, median epoch "
                  f"(Temperature_Pore, {BENCH_PARTICLES} particles)",
        "value": value,
        "unit": "particle-steps/sec/chip",
        "vs_baseline": value / NORTH_STAR,
        "elapsed_throughput": n * n_epochs * spe / elapsed,
        "particles": n,
        "timed_steps": n_epochs * spe,
        "elapsed_sec": elapsed,
        "epoch_times_sec": [round(t, 3) for t in epoch_times],
        "median_epoch_sec": round(median, 3),
        # Best epoch alongside the median headline: tunnel noise can
        # skew identical epochs up to ~3x, so the spread is part of the
        # measurement (VERDICT r3 weak 7).
        "best_epoch_sec": round(min(epoch_times), 3),
        "best_epoch_throughput": n * spe / min(epoch_times),
        "steps_per_sec": value / n,
        "pair_checks_per_sec": (value / n) * checks_per_step,
        "collisions": int(sim.finalize_measure(measure).collision_count),
        "checksum": checksum,
        "device": jax.devices()[0].device_kind,
    }
    from argon_monte_carlo_tpu.io.metrics import device_memory_stats

    mem = device_memory_stats()
    if mem:
        result["device_memory"] = mem
    # Record non-default compile options in the artifact: the 10M
    # mitigation path compiles with reduced optimization effort
    # (engine._engine_jit), and the measurement must say so.
    if os.environ.get("ARGON_COMPILER_OPTIONS"):
        result["compiler_options"] = json.loads(
            os.environ["ARGON_COMPILER_OPTIONS"])
    # Stamp non-default bench knobs so lever/sweep artifacts are
    # self-describing (which program shape produced this number).
    knobs = {k: os.environ[k] for k in
             ("BENCH_CELL_CAP", "BENCH_CELL_OCC",
              "BENCH_PACKED_LAYERS", "BENCH_BF16_HIT",
              "BENCH_OCC_SKIP",
              "BENCH_EAGER_REBUILD", "ARGON_EAGER_REBUILD",
              "BENCH_SPLIT_REBUILD", "ARGON_SPLIT_REBUILD",
              "BENCH_MAX_BLOCK", "ARGON_MAX_BLOCK_STEPS",
              "BENCH_REBUILD_INTERVAL", "BENCH_SPE")
             if os.environ.get(k)}
    if knobs:
        result["bench_knobs"] = knobs
    _attach_committed_10m(result, particles=BENCH_PARTICLES)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
