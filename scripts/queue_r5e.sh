#!/bin/bash
# Round-5 queue e: post-restart all-in 10M ladder.
#
# Context: the 2026-08-20 ~20:49 host restart killed queue_r5d's 10M
# OPTIONS precompile AND revealed that restarts restore the machine
# from the last GIT COMMIT -- ~/.cache/jax_argon (the "durable" cache)
# does not survive.  Mitigations here:
#   1. The compile cache lives INSIDE the repo (runs/jax_cache_r5) and
#      is git-committed after every precompile attempt, so the next
#      restart resumes instead of restarting the ~87-min sweep_body
#      compile from zero.
#   2. The precompile runs in a RETRY LOOP against a time pool: every
#      transport EOF (~1h-in tunnel flakes killed three prior attempts)
#      resumes from the cache rather than ending the rung.
#   3. If the pool expires without the block landing, the reserved
#      bench window runs bench.py 10M anyway: it resumes the remaining
#      compiles from cache inside its own self-deadline -- a real
#      number if they finish, a stale-guarded rc=3 if not.
# Env: ARGON_COMPILER_OPTIONS rides the 1-step block compile (bitwise
# per runs/probe/compiler_options_r4.txt); the eager rebuild ops can't
# take options (XLA_FLAGS effort flags are not registered in this
# build -- checked 2026-08-20) and compile at full effort.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/bench runs/jax_cache_r5
echo $$ > runs/queue_r5e.pid

END_TS=${QUEUE_END_TS:?set QUEUE_END_TS}
OPTS='{"exec_time_optimization_effort": -1.0, "memory_fitting_effort": -1.0, "xla_tpu_enable_latency_hiding_scheduler": "false"}'
CACHE="$PWD/runs/jax_cache_r5"

log () { echo "== queue_r5e: $* $(date -u +%H:%M:%S)"; }

commit_cache () {
  # Restart insurance: only the git tree survives a host restart.
  local sz
  sz=$(du -sm "$CACHE" 2>/dev/null | cut -f1)
  if [ -n "${sz:-}" ] && [ "$sz" -lt 400 ]; then
    if ! git diff --quiet --cached 2>/dev/null || \
       [ -n "$(git status --porcelain runs/jax_cache_r5 runs/bench 2>/dev/null)" ]; then
      git add -f runs/jax_cache_r5 runs/bench >/dev/null 2>&1
      git commit -qm "10M ladder: cache/artifact snapshot ($*, cache ${sz}MB)" \
        >/dev/null 2>&1 && log "cache committed ${sz}MB ($*)"
    fi
  else
    log "cache NOT committed (size ${sz:-?}MB >= 400MB cap)"
  fi
}

probe_backend () {
  for i in 1 2 3; do
    if timeout 420 python -c \
        "import jax; print(jax.devices()[0].device_kind)" \
        > /dev/null 2>&1; then
      log "backend probe ok (attempt $i)"
      return 0
    fi
    log "backend probe failed (attempt $i), cooling down 240s"
    sleep 240
  done
  return 1
}

K8B1_ENV=(BENCH_STALE_EXIT_NONZERO=1 BENCH_PACKED_LAYERS=1
          BENCH_OCC_SKIP=0 BENCH_BF16_HIT=0 ARGON_EAGER_REBUILD=1
          BENCH_MAX_BLOCK=1 BENCH_REBUILD_INTERVAL=8 BENCH_SPE=16
          BENCH_PARTICLES=10000000 "JAX_CACHE_DIR=$CACHE"
          "ARGON_COMPILER_OPTIONS=$OPTS")

# --- rung R: 10M k8b1 retry-loop precompile --------------------------
PRE_END=$((END_TS - 3900))
landed=0
attempt=0
while :; do
  NOW=$(date +%s)
  LEFT=$((PRE_END - NOW))
  if [ "$LEFT" -lt 600 ]; then
    log "precompile pool exhausted after $attempt attempts"
    break
  fi
  if ! probe_backend; then
    log "backend dead; cooling 300s inside the pool"
    sleep 300
    continue
  fi
  attempt=$((attempt + 1))
  log "precompile attempt $attempt start, budget ${LEFT}s"
  env "${K8B1_ENV[@]}" timeout "$LEFT" \
    python scripts/precompile_10m.py \
    >> runs/bench/precompile_10m_k8b1_r5e.log 2>&1
  rc=$?
  log "precompile attempt $attempt rc=$rc"
  commit_cache "precompile attempt $attempt rc=$rc"
  if [ $rc -eq 0 ]; then
    landed=1
    break
  fi
  [ $rc -eq 124 ] && break  # pool timeout, not a flake: stop looping
  sleep 60
done

# --- rung B: 10M bench (runs EVEN IF precompile didn't finish: it
# resumes the remaining compiles from the committed cache under its
# own self-deadline; stale fallback is rc=3 and never committed) ------
NOW=$(date +%s)
if [ $((NOW + 600)) -le "$END_TS" ]; then
  BWIN=$((END_TS - NOW - 120))
  [ "$BWIN" -gt 3600 ] && BWIN=3600
  if probe_backend; then
    log "rung B: 10M k8b1 bench start (landed=$landed, window ${BWIN}s)"
    env "${K8B1_ENV[@]}" BENCH_SELF_DEADLINE=$((BWIN - 180)) \
      timeout "$BWIN" python bench.py \
      > runs/bench/bench_10m_k8b1_r5.json.tmp \
      2>> runs/bench/bench_10m_k8b1_r5.log
    rc=$?
    if [ $rc -eq 0 ] && [ -s runs/bench/bench_10m_k8b1_r5.json.tmp ] \
        && ! grep -q '"stale": true' \
             runs/bench/bench_10m_k8b1_r5.json.tmp; then
      mv runs/bench/bench_10m_k8b1_r5.json.tmp \
        runs/bench/bench_10m_k8b1_r5.json
      cp runs/bench/bench_10m_k8b1_r5.json runs/bench/bench_10m_r5.json
      log "rung B OK: $(cat runs/bench/bench_10m_k8b1_r5.json)"
      git add -f runs/bench/bench_10m_k8b1_r5.json \
        runs/bench/bench_10m_r5.json runs/bench/bench_10m_k8b1_r5.log \
        >/dev/null 2>&1
      git commit -qm "10M north-star bench lands on-chip (k8b1 + reduced-effort block compile)" \
        >/dev/null 2>&1
      commit_cache "post-bench"
    else
      rm -f runs/bench/bench_10m_k8b1_r5.json.tmp
      log "rung B bench FAILED rc=$rc"
      commit_cache "post-bench-fail rc=$rc"
    fi
  else
    log "backend dead at rung B"
  fi
else
  log "rung B SKIP (deadline)"
fi

# --- opportunistic tail (only on big slack) --------------------------
# rung S: sharding tax on chip (VERDICT r4 item 7b)
NOW=$(date +%s)
if [ -s runs/bench/bench_10m_k8b1_r5.json ] \
    && [ $((NOW + 2700)) -le "$END_TS" ]; then
  probe_backend && {
    log "rung S: shard_tax_tpu (mesh=1 vs unsharded)"
    timeout 2700 python scripts/shard_tax_tpu.py \
      runs/bench/shard_tax_tpu_r5.json \
      > runs/bench/shard_tax_tpu_r5.log 2>&1
    log "rung S rc=$? $(tail -1 runs/bench/shard_tax_tpu_r5.log 2>/dev/null)"
    git add -f runs/bench/shard_tax_tpu_r5.json \
      runs/bench/shard_tax_tpu_r5.log >/dev/null 2>&1
    git commit -qm "Sharding tax measured on-chip (mesh=1 sharded vs unsharded)" \
      >/dev/null 2>&1
  }
fi

# rung U: 1M driver-env warm (the driver's end-of-round bench runs
# with NO env against the default cache dir -- warm exactly that)
NOW=$(date +%s)
if [ $((NOW + 2400)) -le "$END_TS" ]; then
  probe_backend && {
    log "rung U: 1M driver-env warm bench"
    BENCH_STALE_EXIT_NONZERO=1 BENCH_SELF_DEADLINE=2100 timeout 2300 \
      python bench.py > runs/bench/bench_1m_r5e.json.tmp \
      2> runs/bench/bench_1m_r5e.log
    rc=$?
    if [ $rc -eq 0 ] && ! grep -q '"stale": true' \
        runs/bench/bench_1m_r5e.json.tmp; then
      mv runs/bench/bench_1m_r5e.json.tmp runs/bench/bench_1m_r5e.json
      log "rung U OK: $(cat runs/bench/bench_1m_r5e.json)"
      git add -f runs/bench/bench_1m_r5e.json runs/bench/bench_1m_r5e.log \
        >/dev/null 2>&1
      git commit -qm "1M shipping bench re-landed post-restart (driver-env cache warm)" \
        >/dev/null 2>&1
    else
      rm -f runs/bench/bench_1m_r5e.json.tmp
      log "rung U FAILED rc=$rc"
    fi
  }
fi

log "done"
