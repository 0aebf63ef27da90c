#!/bin/bash
# Round-5 chip queue b3: queue_r5b2 plus a leading 10M UPGRADE rung.
#
# Rung 0 (new): eager K=8 with max_block_steps=1 -- the rebuild
# amortizes over 8 steps (the flagship cadence) while the only jitted
# step program is the 1-STEP scan, the smallest program the engine can
# emit.  The r5a eager_k1 fallback conflates the two (rebuild EVERY
# step just to shrink the block): projecting the 1M fusion profile to
# 10M, K=1 pays ~3.3 s/step of rebuild while K=8/block=1 pays
# ~0.4 s/step of amortized rebuild + ~0.3 s of extra per-block
# dispatch -- ~4x the throughput from the same compile-sized programs.
# Its eager K=8 op compiles RESUME from the durable cache the 03:01
# eager rung populated until the 06:03 tunnel wedge killed it
# (bitwise gate: tests/test_pairs.py::
# test_max_block_steps_matches_default_bitwise).
#
# Then the reprioritized r5b2 rungs: shipping 1M bench, occ-skip A/B,
# tiered-cap probe + gated A/B, shard tax, bf16 A/B.  Every rung
# deadline-guarded (END_TS reserves 45 min for the driver's
# end-of-round bench) and stale-guarded.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/bench runs/probe
echo $$ > runs/queue_r5b.pid

END_TS=${QUEUE_END_TS:-1787237100}

log () { echo "== queue_r5b4: $* $(date -u +%H:%M:%S)"; }

fits () {
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

# --- rung P (hoisted probe): tiered-cap probe ----------------------------------------
if [ -s runs/probe/tiered_cap_r5.json ]; then
  log "rung P (hoisted probe): already landed, skipping"
elif fits 1800; then
  probe_backend || { log "backend dead at rung P (hoisted probe); aborting"; exit 1; }
  log "rung P (hoisted probe): probe_tiered_cap"
  timeout 1800 python scripts/probe_tiered_cap.py \
    > runs/probe/tiered_cap_r5.log 2>&1
  log "rung P (hoisted probe) rc=$?"
fi

# --- rung 0: 10M upgrade (eager K=8, 1-step blocks) -------------------
K8B1_ENV=(BENCH_STALE_EXIT_NONZERO=1 BENCH_PACKED_LAYERS=1
          BENCH_OCC_SKIP=0 BENCH_BF16_HIT=0 ARGON_EAGER_REBUILD=1
          BENCH_MAX_BLOCK=1 BENCH_REBUILD_INTERVAL=8 BENCH_SPE=16
          BENCH_PARTICLES=10000000)
if [ -s runs/bench/bench_10m_k8b1_r5.json ]; then
  log "rung 0: k8b1 already landed, skipping"
elif fits 7200; then
  probe_backend || { log "backend dead at rung 0; aborting"; exit 1; }
  log "rung 0: 10M k8b1 precompile start, budget 3600s"
  env "${K8B1_ENV[@]}" timeout 3600 python scripts/precompile_10m.py \
    > runs/bench/precompile_10m_k8b1_r5.log 2>&1
  rc=$?
  log "rung 0 precompile rc=$rc"
  if [ $rc -eq 0 ]; then
    log "rung 0: 10M k8b1 bench start"
    env "${K8B1_ENV[@]}" BENCH_SELF_DEADLINE=3300 timeout 3600 \
      python bench.py > runs/bench/bench_10m_k8b1_r5.json.tmp \
      2> runs/bench/bench_10m_k8b1_r5.log
    rc=$?
    if [ $rc -eq 0 ] && [ -s runs/bench/bench_10m_k8b1_r5.json.tmp ] \
        && ! grep -q '"stale": true' runs/bench/bench_10m_k8b1_r5.json.tmp; then
      mv runs/bench/bench_10m_k8b1_r5.json.tmp \
        runs/bench/bench_10m_k8b1_r5.json
      log "rung 0 OK: $(cat runs/bench/bench_10m_k8b1_r5.json)"
      # Promote to the canonical 10M artifact only if it beats the
      # incumbent (the k1 rung's number, when that landed).
      python - << 'PY'
import json, os, shutil
new = json.load(open("runs/bench/bench_10m_k8b1_r5.json"))
canon = "runs/bench/bench_10m_r5.json"
old_v = -1.0
if os.path.exists(canon):
    try:
        old_v = float(json.load(open(canon)).get("value", -1.0))
    except Exception:
        pass
if float(new.get("value", -1.0)) > old_v:
    shutil.copy("runs/bench/bench_10m_k8b1_r5.json", canon)
    print(f"promoted k8b1 ({new.get('value'):.4g}) over {old_v:.4g}")
else:
    print(f"kept incumbent ({old_v:.4g} >= {new.get('value'):.4g})")
PY
    else
      rm -f runs/bench/bench_10m_k8b1_r5.json.tmp
      log "rung 0 bench FAILED rc=$rc"
    fi
  fi
fi

# --- rung 1: shipping 1M bench ---------------------------------------
if [ -s runs/bench/bench_1m_r5.json ]; then
  log "rung 1: 1M already landed, skipping"
elif fits 3600; then
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

# --- rung 2: occ_skip A/B (B = skip ON vs the new OFF default) --------
if [ -s runs/bench/ab_occskip_r5.json ]; then
  log "rung 2: already landed, skipping"
elif fits 5400; then
  probe_backend || { log "backend dead at rung 2; aborting"; exit 1; }
  log "rung 2: A/B rebuild_occupancy_skip (B = skip ON)"
  AB_OVERRIDES_B='{"rebuild_occupancy_skip": true}' timeout 5400 \
    python scripts/ab_bench.py runs/bench/ab_occskip_r5.json \
    > runs/bench/ab_occskip_r5.log 2>&1
  log "rung 2 rc=$? $(tail -1 runs/bench/ab_occskip_r5.log)"
fi

# --- rung 4: tiered-cap A/B (gated on a CHIP probe result) -----------
if [ -s runs/probe/tiered_cap_r5.json ] \
    && grep -q '"gate_passed": true' runs/probe/tiered_cap_r5.json \
    && ! grep -q '"device": "cpu"' runs/probe/tiered_cap_r5.json; then
  if [ -s runs/bench/ab_tiered_r5.json ]; then
    log "rung 4: already landed, skipping"
  elif fits 5400; then
    probe_backend || { log "backend dead at rung 4; aborting"; exit 1; }
    log "rung 4: A/B rebuild_tiered_cap (probe gate passed)"
    AB_OVERRIDES_B='{"rebuild_tiered_cap": true}' timeout 5400 \
      python scripts/ab_bench.py runs/bench/ab_tiered_r5.json \
      > runs/bench/ab_tiered_r5.log 2>&1
    log "rung 4 rc=$? $(tail -1 runs/bench/ab_tiered_r5.log)"
  fi
else
  log "rung 4 SKIPPED: tiered-cap chip probe gate not passed"
fi

# --- rung 5: sharding tax on chip -------------------------------------
if [ -s runs/bench/shard_tax_tpu_r5.json ]; then
  log "rung 5: already landed, skipping"
elif fits 5400; then
  probe_backend || { log "backend dead at rung 5; aborting"; exit 1; }
  log "rung 5: shard_tax_tpu (mesh=1 vs unsharded)"
  timeout 5400 python scripts/shard_tax_tpu.py \
    runs/bench/shard_tax_tpu_r5.json \
    > runs/bench/shard_tax_tpu_r5.log 2>&1
  log "rung 5 rc=$? $(tail -1 runs/bench/shard_tax_tpu_r5.log)"
fi

# --- rung 6: bf16 A/B -------------------------------------------------
if [ -s runs/bench/ab_bf16_r5.json ]; then
  log "rung 6: already landed, skipping"
elif fits 5400; then
  probe_backend || { log "backend dead at rung 6; aborting"; exit 1; }
  log "rung 6: A/B rebuild_bf16_hittest"
  AB_OVERRIDES_B='{"rebuild_bf16_hittest": true}' timeout 5400 \
    python scripts/ab_bench.py runs/bench/ab_bf16_r5.json \
    > runs/bench/ab_bf16_r5.log 2>&1
  log "rung 6 rc=$? $(tail -1 runs/bench/ab_bf16_r5.log)"
fi

log "done"
