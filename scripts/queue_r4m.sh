#!/bin/bash
# Round-4 chip queue m: consolidated priority chain replacing the
# waiting h/i/j/k/l orchestrators (killed before launch; none held the
# grant).  Order puts the north star first:
#   1. (after queue g drains) if no 10M artifact: EAGER-REBUILD 10M --
#      ARGON_EAGER_REBUILD=1 decomposes the walled monolithic rebuild
#      into per-op programs (engine.py escape hatch) -- precompile
#      (runs K real steps; the block program lands in the durable
#      cache) then bench.  The eager knob is stamped into the JSON.
#   2. phases2 fine-grained rebuild attribution (decides lever flips).
#   3. grid-shape sweep (cap16_occ11 / cap24_occ16 / cap16_occ8).
#   4. engine-level lever benches (packed, bf16hit, onepass, all).
#   5. occupancy-skip A/B (BENCH_OCC_SKIP=0).
# ONE grant; strictly serial; bounded probe before each job.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/bench runs/profile
echo $$ > runs/queue_r4m.pid

while ! grep -qs "queue_r4g: done\|queue_r4g: .*aborting" runs/queue_r4g.log; do
  gpid=$(cat runs/queue_r4g.pid 2>/dev/null || true)
  if [ -n "${gpid:-}" ] \
     && ! grep -qsa "queue_r4g" "/proc/$gpid/cmdline" 2>/dev/null; then
    echo "== queue_r4m: queue g orchestrator gone, proceeding"
    break
  fi
  sleep 180
done

probe () {
  for i in 1 2 3 4; do
    if timeout 420 python -c "import jax; print(jax.devices()[0].device_kind)" \
        > /dev/null 2>&1; then
      echo "== queue_r4m: probe ok (attempt $i) $(date -u +%H:%M:%S)"
      return 0
    fi
    echo "== queue_r4m: probe failed (attempt $i), cooling down 300s"
    sleep 300
  done
  return 1
}

# ---- 1. eager-rebuild 10M contingency --------------------------------
if [ -s runs/bench/bench_10m_r4.json ]; then
  echo "== queue_r4m: 10M already landed, skipping eager contingency"
else
  probe || { echo "== queue_r4m: backend dead, aborting"; exit 1; }
  echo "== queue_r4m: eager 10M precompile start $(date -u +%H:%M:%S)"
  ARGON_EAGER_REBUILD=1 BENCH_PARTICLES=10000000 \
    timeout 10800 python scripts/precompile_10m.py \
    > runs/bench/precompile_10m_eager_r4.log 2>&1
  rc=$?
  echo "== queue_r4m: eager precompile rc=$rc $(date -u +%H:%M:%S)"
  if [ $rc -eq 0 ]; then
    probe || { echo "== queue_r4m: backend dead, aborting"; exit 1; }
    echo "== queue_r4m: eager 10M bench start $(date -u +%H:%M:%S)"
    ARGON_EAGER_REBUILD=1 BENCH_PARTICLES=10000000 \
      timeout 10800 python bench.py \
      > runs/bench/bench_10m_r4.json.tmp \
      2>> runs/bench/bench_10m_r4.log
    rc=$?
    if [ $rc -eq 0 ] && [ -s runs/bench/bench_10m_r4.json.tmp ]; then
      mv runs/bench/bench_10m_r4.json.tmp runs/bench/bench_10m_r4.json
      echo "== queue_r4m: 10M OK (eager): $(cat runs/bench/bench_10m_r4.json)"
    else
      rm -f runs/bench/bench_10m_r4.json.tmp
      echo "== queue_r4m: eager 10M bench FAILED rc=$rc"
    fi
  fi
fi

# ---- 2. phases2 attribution ------------------------------------------
if grep -qs "^done" runs/profile/rebuild_phases2_1m_r4.txt; then
  echo "== queue_r4m: phases2 already landed, skipping"
else
  for attempt in 1 2; do
    probe || { echo "== queue_r4m: backend dead, aborting"; exit 1; }
    echo "== queue_r4m: phases2 start (attempt $attempt) $(date -u +%H:%M:%S)"
    timeout 2400 python scripts/profile_rebuild_phases2.py \
      > runs/profile/rebuild_phases2_1m_r4.txt \
      2> runs/profile/rebuild_phases2_1m_r4.log
    rc=$?
    echo "== queue_r4m: phases2 rc=$rc $(date -u +%H:%M:%S)"
    if [ $rc -eq 0 ] && grep -q "^done" runs/profile/rebuild_phases2_1m_r4.txt; then
      break
    fi
    echo "== queue_r4m: phases2 incomplete, cooling down 300s"
    sleep 300
  done
fi

run_point () {
  local tag=$1; shift
  if [ -s "runs/bench/bench_1m_${tag}.json" ]; then
    echo "== queue_r4m: $tag already landed, skipping"
    return 0
  fi
  probe || { echo "== queue_r4m: backend dead before $tag, aborting"; exit 1; }
  echo "== queue_r4m: $tag start $(date -u +%H:%M:%S)"
  env "$@" timeout 2700 python bench.py \
    > "runs/bench/bench_1m_${tag}.json.tmp" \
    2> "runs/bench/bench_1m_${tag}.log"
  local rc=$?
  if [ $rc -eq 0 ] && [ -s "runs/bench/bench_1m_${tag}.json.tmp" ]; then
    mv "runs/bench/bench_1m_${tag}.json.tmp" "runs/bench/bench_1m_${tag}.json"
    echo "== queue_r4m: $tag OK: $(cat runs/bench/bench_1m_${tag}.json)"
  else
    rm -f "runs/bench/bench_1m_${tag}.json.tmp"
    echo "== queue_r4m: $tag FAILED rc=$rc"
  fi
}

# ---- 3. grid-shape sweep ---------------------------------------------
run_point cap16_occ11 BENCH_CELL_CAP=16 BENCH_CELL_OCC=11.0
run_point cap24_occ16 BENCH_CELL_CAP=24 BENCH_CELL_OCC=16.0
run_point cap16_occ8 BENCH_CELL_CAP=16 BENCH_CELL_OCC=8.0

# ---- 4. engine-level lever benches -----------------------------------
run_point onepass BENCH_ONEPASS_TOPK=1
run_point packed  BENCH_PACKED_LAYERS=1
run_point bf16hit BENCH_BF16_HIT=1
run_point all_levers BENCH_PACKED_LAYERS=1 BENCH_BF16_HIT=1 BENCH_ONEPASS_TOPK=1

# ---- 5. occupancy-skip A/B -------------------------------------------
run_point occskip_off BENCH_OCC_SKIP=0

echo "== queue_r4m: done $(date -u +%H:%M:%S)"
