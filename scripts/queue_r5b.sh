#!/bin/bash
# Round-5 chip queue b: runs AFTER queue_r5a (the 10M ladder) releases
# the single TPU grant.  Strictly serial; every rung bounded; stale
# output can never be committed as a landed measurement.
#
# Rungs (VERDICT r4 items 2/3/4/7b):
#   1. probe_tiered_cap      -- isolated sweep-shape probe, gate <= 0.80
#   2. bench 1M shipping     -- fresh artifact with the r5 defaults
#                               (packed ON); warms the driver's program
#   3. ab occ_skip           -- same-session interleaved A/B, decides
#                               the one open r4 lever
#   4. ab tiered_cap         -- merge gate (>= +8%, CI excluding 0),
#                               only if rung 1's gate passed
#   5. shard_tax_tpu         -- mesh=1 sharded vs unsharded on chip
#   6. ab bf16_hit           -- re-decide with the interleaved harness
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/bench runs/probe
echo $$ > runs/queue_r5b.pid

log () { echo "== queue_r5b: $* $(date -u +%H:%M:%S)"; }

# --- wait for queue_r5a to release the grant -------------------------
if [ -f runs/queue_r5a.pid ]; then
  A_PID=$(cat runs/queue_r5a.pid)
  while [ -n "$A_PID" ] && kill -0 "$A_PID" 2>/dev/null; do
    sleep 60
  done
fi
log "queue_r5a done; grant free"

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

# --- rung 1: tiered-cap probe ----------------------------------------
probe_backend || { log "backend dead at rung 1; aborting"; exit 1; }
log "rung 1: probe_tiered_cap"
timeout 1800 python scripts/probe_tiered_cap.py \
  > runs/probe/tiered_cap_r5.log 2>&1
log "rung 1 rc=$?"

# --- rung 2: shipping 1M bench ---------------------------------------
probe_backend || { log "backend dead at rung 2; aborting"; exit 1; }
log "rung 2: bench 1M shipping defaults"
BENCH_SELF_DEADLINE=3300 BENCH_STALE_EXIT_NONZERO=1 timeout 3600 \
  python bench.py > runs/bench/bench_1m_r5.json.tmp \
  2> runs/bench/bench_1m_r5.log
rc=$?
if [ $rc -eq 0 ] && [ -s runs/bench/bench_1m_r5.json.tmp ] \
    && ! grep -q '"stale": true' runs/bench/bench_1m_r5.json.tmp; then
  mv runs/bench/bench_1m_r5.json.tmp runs/bench/bench_1m_r5.json
  log "rung 2 OK: $(cat runs/bench/bench_1m_r5.json)"
else
  rm -f runs/bench/bench_1m_r5.json.tmp
  log "rung 2 FAILED rc=$rc"
fi

# --- rung 3: occ_skip A/B --------------------------------------------
probe_backend || { log "backend dead at rung 3; aborting"; exit 1; }
log "rung 3: A/B rebuild_occupancy_skip"
AB_OVERRIDES_B='{"rebuild_occupancy_skip": false}' timeout 5400 \
  python scripts/ab_bench.py runs/bench/ab_occskip_r5.json \
  > runs/bench/ab_occskip_r5.log 2>&1
log "rung 3 rc=$? $(tail -c 300 runs/bench/ab_occskip_r5.log | tail -1)"

# --- rung 4: tiered-cap A/B (gated on rung 1) ------------------------
if [ -s runs/probe/tiered_cap_r5.json ] \
    && grep -q '"gate_passed": true' runs/probe/tiered_cap_r5.json; then
  probe_backend || { log "backend dead at rung 4; aborting"; exit 1; }
  log "rung 4: A/B rebuild_tiered_cap (probe gate passed)"
  AB_OVERRIDES_B='{"rebuild_tiered_cap": true}' timeout 5400 \
    python scripts/ab_bench.py runs/bench/ab_tiered_r5.json \
    > runs/bench/ab_tiered_r5.log 2>&1
  log "rung 4 rc=$? $(tail -1 runs/bench/ab_tiered_r5.log)"
else
  log "rung 4 SKIPPED: tiered-cap probe gate not passed"
fi

# --- rung 5: sharding tax on chip -------------------------------------
probe_backend || { log "backend dead at rung 5; aborting"; exit 1; }
log "rung 5: shard_tax_tpu (mesh=1 vs unsharded)"
timeout 5400 python scripts/shard_tax_tpu.py \
  runs/bench/shard_tax_tpu_r5.json \
  > runs/bench/shard_tax_tpu_r5.log 2>&1
log "rung 5 rc=$? $(tail -1 runs/bench/shard_tax_tpu_r5.log)"

# --- rung 6: bf16 A/B -------------------------------------------------
probe_backend || { log "backend dead at rung 6; aborting"; exit 1; }
log "rung 6: A/B rebuild_bf16_hittest"
AB_OVERRIDES_B='{"rebuild_bf16_hittest": true}' timeout 5400 \
  python scripts/ab_bench.py runs/bench/ab_bf16_r5.json \
  > runs/bench/ab_bf16_r5.log 2>&1
log "rung 6 rc=$? $(tail -1 runs/bench/ab_bf16_r5.log)"

log "done"
