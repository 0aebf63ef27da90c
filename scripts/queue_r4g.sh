#!/bin/bash
# Round-4 chip queue g (v3): after the 1M shape sweep (queue f) drains:
#   1. rebuild phase attribution at 1M (~10 min incl. compiles)
#   2. the 10M north-star bench, NEW strategy: plain compile failed
#      twice (2h20 killed, 4h timeout) with ZERO cache progress -- the
#      remote service never finished even the rebuild program.  So:
#      a. tiny-N on-chip probe that reduced-effort compiler options
#         ride the tunnel (scripts/probe_compiler_options.py)
#      b. resumable 10M precompile WITH the strongest usable option set
#         (ARGON_COMPILER_OPTIONS -> engine._engine_jit), 2.5h budget
#      c. 10M bench with the same env (options recorded in the JSON)
#      d. fallback: plain precompile (5h) + plain bench (3h)
# ONE grant; strictly serial.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/bench runs/profile runs/probe
until grep -q "queue_r4f: done" runs/queue_r4f.log 2>/dev/null; do
  sleep 120
done

probe () {
  for i in 1 2 3 4; do
    if timeout 420 python -c "import jax; print(jax.devices()[0].device_kind)" \
        > /dev/null 2>&1; then
      echo "== queue_r4g: probe ok (attempt $i) $(date -u +%H:%M:%S)"
      return 0
    fi
    echo "== queue_r4g: probe failed (attempt $i), cooling down 300s"
    sleep 300
  done
  return 1
}

probe || { echo "== queue_r4g: backend dead, aborting"; exit 1; }
echo "== queue_r4g: rebuild phases start $(date -u +%H:%M:%S)"
timeout 2400 python scripts/profile_rebuild_phases.py \
  > runs/profile/rebuild_phases_1m_r4.txt \
  2> runs/profile/rebuild_phases_1m_r4.log
echo "== queue_r4g: rebuild phases rc=$? $(date -u +%H:%M:%S)"

if [ -s runs/bench/bench_10m_r4.json ]; then
  echo "== queue_r4g: 10M already landed, done"
  exit 0
fi

probe || { echo "== queue_r4g: backend dead, aborting"; exit 1; }
echo "== queue_r4g: compiler-options probe start $(date -u +%H:%M:%S)"
timeout 3000 python scripts/probe_compiler_options.py \
  > runs/probe/compiler_options_r4.txt \
  2> runs/probe/compiler_options_r4.log
echo "== queue_r4g: options probe rc=$? $(date -u +%H:%M:%S)"

OPTS=""
if grep -q "effort_min_no_lhs.*\"ok\": true" runs/probe/compiler_options_r4.txt; then
  OPTS='{"exec_time_optimization_effort": -1.0, "memory_fitting_effort": -1.0, "xla_tpu_enable_latency_hiding_scheduler": "false"}'
elif grep -q "effort_min.*\"ok\": true" runs/probe/compiler_options_r4.txt; then
  OPTS='{"exec_time_optimization_effort": -1.0, "memory_fitting_effort": -1.0}'
fi

bench_10m () {
  # $1 = tag for logs; env (ARGON_COMPILER_OPTIONS) set by caller
  probe || { echo "== queue_r4g: backend dead before bench ($1)"; return 1; }
  echo "== queue_r4g: 10M bench ($1) start $(date -u +%H:%M:%S)"
  BENCH_PARTICLES=10000000 timeout 10800 python bench.py \
    > runs/bench/bench_10m_r4.json.tmp 2>> runs/bench/bench_10m_r4.log
  local rc=$?
  if [ $rc -eq 0 ] && [ -s runs/bench/bench_10m_r4.json.tmp ]; then
    mv runs/bench/bench_10m_r4.json.tmp runs/bench/bench_10m_r4.json
    echo "== queue_r4g: 10M OK ($1): $(cat runs/bench/bench_10m_r4.json)"
    return 0
  fi
  rm -f runs/bench/bench_10m_r4.json.tmp
  echo "== queue_r4g: 10M bench ($1) FAILED rc=$rc"
  return 1
}

if [ -n "$OPTS" ]; then
  probe || { echo "== queue_r4g: backend dead, aborting"; exit 1; }
  echo "== queue_r4g: 10M precompile (options) start $(date -u +%H:%M:%S)"
  echo "== queue_r4g: options = $OPTS"
  ARGON_COMPILER_OPTIONS="$OPTS" BENCH_PARTICLES=10000000 \
    timeout 9000 python scripts/precompile_10m.py \
    > runs/bench/precompile_10m_opts_r4.log 2>&1
  rc=$?
  echo "== queue_r4g: precompile (options) rc=$rc $(date -u +%H:%M:%S)"
  if [ $rc -eq 0 ]; then
    ARGON_COMPILER_OPTIONS="$OPTS" bench_10m "options" && \
      { echo "== queue_r4g: done $(date -u +%H:%M:%S)"; exit 0; }
  fi
else
  echo "== queue_r4g: no usable option set; going straight to plain"
fi

probe || { echo "== queue_r4g: backend dead, aborting"; exit 1; }
echo "== queue_r4g: 10M precompile (plain) start $(date -u +%H:%M:%S)"
BENCH_PARTICLES=10000000 timeout 18000 python scripts/precompile_10m.py \
  > runs/bench/precompile_10m_r4.log 2>&1
echo "== queue_r4g: precompile (plain) rc=$? $(date -u +%H:%M:%S)"
bench_10m "plain"
echo "== queue_r4g: done $(date -u +%H:%M:%S)"
