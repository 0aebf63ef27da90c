#!/bin/bash
# Round-5 chip queue b2: reprioritized replacement for queue_r5b.
#
# Why the reorder: the round ends ~15:31 UTC (driver PROGRESS ts +11h)
# and queue_r5a's worst case (eager_k1 fallback) releases the grant
# only ~10:45, leaving ~4h for what was a ~7.5h ladder.  Rungs are now
# ordered by value-per-hour and each rung refuses to START unless its
# full timeout fits before the END_TS guard (45 min reserved for the
# driver's end-of-round bench on the same single grant):
#
#   1. bench 1M shipping   -- fresh r5 artifact + warms the exact
#                             program the driver's BENCH_r05 runs
#   2. ab occ_skip         -- decides the one open r4 lever (CI-based)
#   3. probe tiered_cap    -- isolated sweep-shape probe, gate <= 0.80
#   4. ab tiered_cap       -- merge gate (>= +8%, CI excluding 0),
#                             only if rung 3's gate passed
#   5. shard_tax_tpu       -- mesh=1 sharded vs unsharded on chip
#   6. ab bf16_hit         -- re-decide with the interleaved harness
#
# Stale-safety unchanged from queue_r5b: BENCH_STALE_EXIT_NONZERO plus
# a '"stale"' grep before any mv.  Strictly serial; no pattern kills.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/bench runs/probe
echo $$ > runs/queue_r5b.pid

# Round end ~ts 1787239914 (PROGRESS round-5 start + 11h); reserve
# 45 min for the driver's own bench.
END_TS=${QUEUE_END_TS:-1787237100}

log () { echo "== queue_r5b2: $* $(date -u +%H:%M:%S)"; }

fits () {  # $1 = rung timeout in seconds
  local now; now=$(date +%s)
  if [ $((now + $1)) -le "$END_TS" ]; then return 0; fi
  log "SKIP (deadline): rung needs $1s, only $((END_TS - now))s left"
  return 1
}

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

# --- rung 1: shipping 1M bench ---------------------------------------
if fits 3600; then
  probe_backend || { log "backend dead at rung 1; aborting"; exit 1; }
  log "rung 1: bench 1M shipping defaults"
  BENCH_SELF_DEADLINE=3300 BENCH_STALE_EXIT_NONZERO=1 timeout 3600 \
    python bench.py > runs/bench/bench_1m_r5.json.tmp \
    2> runs/bench/bench_1m_r5.log
  rc=$?
  if [ $rc -eq 0 ] && [ -s runs/bench/bench_1m_r5.json.tmp ] \
      && ! grep -q '"stale": true' runs/bench/bench_1m_r5.json.tmp; then
    mv runs/bench/bench_1m_r5.json.tmp runs/bench/bench_1m_r5.json
    log "rung 1 OK: $(cat runs/bench/bench_1m_r5.json)"
  else
    rm -f runs/bench/bench_1m_r5.json.tmp
    log "rung 1 FAILED rc=$rc"
  fi
fi

# --- rung 2: occ_skip A/B --------------------------------------------
# The r5 default flipped occ_skip OFF (config.py: the best point
# estimate + the 10M ladder's pinned knob), so B now measures the
# skip ON against the new shipping default; flip back only on a
# B_FASTER verdict.
if fits 5400; then
  probe_backend || { log "backend dead at rung 2; aborting"; exit 1; }
  log "rung 2: A/B rebuild_occupancy_skip (B = skip ON)"
  AB_OVERRIDES_B='{"rebuild_occupancy_skip": true}' timeout 5400 \
    python scripts/ab_bench.py runs/bench/ab_occskip_r5.json \
    > runs/bench/ab_occskip_r5.log 2>&1
  log "rung 2 rc=$? $(tail -1 runs/bench/ab_occskip_r5.log)"
fi

# --- rung 3: tiered-cap probe ----------------------------------------
if fits 1800; then
  probe_backend || { log "backend dead at rung 3; aborting"; exit 1; }
  log "rung 3: probe_tiered_cap"
  timeout 1800 python scripts/probe_tiered_cap.py \
    > runs/probe/tiered_cap_r5.log 2>&1
  log "rung 3 rc=$?"
fi

# --- rung 4: tiered-cap A/B (gated on rung 3) ------------------------
# The gate file must be a CHIP result: a CPU smoke of the probe once
# landed under this name (runs/probe/tiered_cap_cpusmoke.json keeps
# it) and must never satisfy the chip gate.
if [ -s runs/probe/tiered_cap_r5.json ] \
    && grep -q '"gate_passed": true' runs/probe/tiered_cap_r5.json \
    && ! grep -q '"device": "cpu"' runs/probe/tiered_cap_r5.json; then
  if fits 5400; then
    probe_backend || { log "backend dead at rung 4; aborting"; exit 1; }
    log "rung 4: A/B rebuild_tiered_cap (probe gate passed)"
    AB_OVERRIDES_B='{"rebuild_tiered_cap": true}' timeout 5400 \
      python scripts/ab_bench.py runs/bench/ab_tiered_r5.json \
      > runs/bench/ab_tiered_r5.log 2>&1
    log "rung 4 rc=$? $(tail -1 runs/bench/ab_tiered_r5.log)"
  fi
else
  log "rung 4 SKIPPED: tiered-cap probe gate not passed"
fi

# --- rung 5: sharding tax on chip -------------------------------------
if fits 5400; then
  probe_backend || { log "backend dead at rung 5; aborting"; exit 1; }
  log "rung 5: shard_tax_tpu (mesh=1 vs unsharded)"
  timeout 5400 python scripts/shard_tax_tpu.py \
    runs/bench/shard_tax_tpu_r5.json \
    > runs/bench/shard_tax_tpu_r5.log 2>&1
  log "rung 5 rc=$? $(tail -1 runs/bench/shard_tax_tpu_r5.log)"
fi

# --- rung 6: bf16 A/B -------------------------------------------------
if fits 5400; then
  probe_backend || { log "backend dead at rung 6; aborting"; exit 1; }
  log "rung 6: A/B rebuild_bf16_hittest"
  AB_OVERRIDES_B='{"rebuild_bf16_hittest": true}' timeout 5400 \
    python scripts/ab_bench.py runs/bench/ab_bf16_r5.json \
    > runs/bench/ab_bf16_r5.log 2>&1
  log "rung 6 rc=$? $(tail -1 runs/bench/ab_bf16_r5.log)"
fi

log "done"
