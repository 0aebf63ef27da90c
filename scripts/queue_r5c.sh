#!/bin/bash
# Round-5 contingency queue: runs AFTER queue_r5b4 releases the grant.
#
# Rung R: retry the 10M k8b1 rung if r5b4's attempt did not land
#   (its 3600s precompile budget may be shorter than the 1-step block's
#   remote compile; a retry must give the block ONE uninterrupted
#   window, so the precompile budget here is "everything left minus a
#   warm-cache 10M bench slot" rather than a fixed number).
# Rung X (stretch, only when the 10M has landed and >=5400s remain):
#   interleaved A/B of rebuild_interval=16 vs the shipping K=8 -- the
#   pre-registered K-retuning direction (COMPONENTS.md roofline): K=16
#   halves the amortized rebuild (75% of the step at K=8) against a
#   wider pair list.  Decision rule is ab_bench's CI-excludes-zero.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/bench
echo $$ > runs/queue_r5c.pid

END_TS=${QUEUE_END_TS:-1787237100}

log () { echo "== queue_r5c: $* $(date -u +%H:%M:%S)"; }

# --- wait for queue_r5b4 to release the grant -------------------------
if [ -f runs/queue_r5b.pid ]; then
  B_PID=$(cat runs/queue_r5b.pid)
  while [ -n "$B_PID" ] && kill -0 "$B_PID" 2>/dev/null; do
    sleep 60
  done
fi
log "queue_r5b4 done; grant free"

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
          BENCH_PARTICLES=10000000)

# --- rung R: 10M k8b1 retry ------------------------------------------
if [ -s runs/bench/bench_10m_k8b1_r5.json ]; then
  log "rung R: 10M k8b1 already landed, skipping"
else
  NOW=$(date +%s)
  AVAIL=$((END_TS - NOW))
  # Reserve 2700s for the warm-cache 10M bench step; everything else
  # goes to the (resumable) precompile in ONE window.
  PRE_BUDGET=$((AVAIL - 2700))
  if [ "$PRE_BUDGET" -lt 1800 ]; then
    log "rung R SKIP (deadline): only ${AVAIL}s left"
  elif ! probe_backend; then
    log "backend dead at rung R; aborting"
    exit 1
  else
    log "rung R: 10M k8b1 precompile retry, budget ${PRE_BUDGET}s"
    env "${K8B1_ENV[@]}" timeout "$PRE_BUDGET" \
      python scripts/precompile_10m.py \
      >> runs/bench/precompile_10m_k8b1_r5.log 2>&1
    rc=$?
    log "rung R precompile rc=$rc"
    if [ $rc -eq 0 ]; then
      log "rung R: 10M k8b1 bench start"
      env "${K8B1_ENV[@]}" BENCH_SELF_DEADLINE=2400 timeout 2700 \
        python bench.py > runs/bench/bench_10m_k8b1_r5.json.tmp \
        2>> runs/bench/bench_10m_k8b1_r5.log
      rc=$?
      if [ $rc -eq 0 ] && [ -s runs/bench/bench_10m_k8b1_r5.json.tmp ] \
          && ! grep -q '"stale": true' \
               runs/bench/bench_10m_k8b1_r5.json.tmp; then
        mv runs/bench/bench_10m_k8b1_r5.json.tmp \
          runs/bench/bench_10m_k8b1_r5.json
        cp runs/bench/bench_10m_k8b1_r5.json runs/bench/bench_10m_r5.json
        log "rung R OK: $(cat runs/bench/bench_10m_k8b1_r5.json)"
      else
        rm -f runs/bench/bench_10m_k8b1_r5.json.tmp
        log "rung R bench FAILED rc=$rc"
      fi
    fi
  fi
fi

# --- rung X (stretch): K=16 rebuild-interval A/B ----------------------
if [ -s runs/bench/ab_k16_r5.json ]; then
  log "rung X: already landed, skipping"
elif [ ! -s runs/bench/bench_10m_k8b1_r5.json ]; then
  log "rung X SKIP: 10M not landed; not spending its window"
else
  NOW=$(date +%s)
  if [ $((NOW + 5400)) -le "$END_TS" ]; then
    probe_backend || { log "backend dead at rung X; aborting"; exit 1; }
    log "rung X: A/B rebuild_interval=16 vs shipping K=8"
    AB_OVERRIDES_B='{"rebuild_interval": 16}' timeout 5400 \
      python scripts/ab_bench.py runs/bench/ab_k16_r5.json \
      > runs/bench/ab_k16_r5.log 2>&1
    log "rung X rc=$? $(tail -1 runs/bench/ab_k16_r5.log)"
  else
    log "rung X SKIP (deadline)"
  fi
fi

log "done"
