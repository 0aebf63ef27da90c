#!/bin/bash
# Round-4 chip queue m (v2): north-star-first chain with an early
# takeover.  Queue g's last rung is a 3 h monolithic 10M bench attempt
# AFTER its plain precompile fails -- near-certain waste given five
# failed monolith compiles.  v2 watches for the precompile verdict:
#   rc=0  -> let g bench from its warm cache; wait for g: done.
#   rc!=0 -> kill g's orchestrator + its children (exact pids from the
#            /proc ppid tree, never pattern match), settle the grant,
#            and run the DECOMPOSED 10M ladder instead:
#              split-rebuild (3 programs; ARGON_SPLIT_REBUILD=1), then
#              eager-rebuild (per-op programs; ARGON_EAGER_REBUILD=1).
#            Rationale: compile time scales ~quadratically in program
#            size at fixed N (fused->split at 1M: 14 -> 3.5 min), so
#            the split sweep program should compile in roughly a third
#            of the monolith's (>4 h) time and eager's chunk-scan in a
#            quarter.
# Then phases2 attribution, the grid-shape sweep, the lever benches,
# and the occupancy-skip A/B, each skipping itself if its artifact
# exists.  ONE grant; strictly serial; bounded probe before each job.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/bench runs/profile
echo $$ > runs/queue_r4m.pid

kill_tree () {  # kill an exact pid and its children (exact pids via PPid)
  local pid=$1
  local kids grandkids
  kids=$(awk -v P="$pid" '$1=="PPid:" && $2==P \
    {split(FILENAME, a, "/"); print a[3]; nextfile}' \
    /proc/[0-9]*/status 2>/dev/null)
  grandkids=""
  for k in $kids; do
    grandkids="$grandkids $(awk -v P="$k" '$1=="PPid:" && $2==P \
      {split(FILENAME, a, "/"); print a[3]; nextfile}' \
      /proc/[0-9]*/status 2>/dev/null)"
  done
  kill "$pid" 2>/dev/null
  for k in $kids $grandkids; do kill "$k" 2>/dev/null; done
  sleep 5
  for k in $kids $grandkids; do kill -9 "$k" 2>/dev/null; done
}

took_over=0
while :; do
  if grep -qs "queue_r4g: done\|queue_r4g: .*aborting" runs/queue_r4g.log; then
    echo "== queue_r4m: queue g finished on its own"
    break
  fi
  gpid=$(cat runs/queue_r4g.pid 2>/dev/null || true)
  if [ -n "${gpid:-}" ] \
     && ! grep -qsa "queue_r4g" "/proc/$gpid/cmdline" 2>/dev/null; then
    echo "== queue_r4m: queue g orchestrator gone, proceeding"
    break
  fi
  if grep -qs "precompile (plain) rc=0" runs/queue_r4g.log; then
    : # precompile succeeded; let g run its bench from the warm cache
  elif grep -qs "precompile (plain) rc=" runs/queue_r4g.log; then
    echo "== queue_r4m: plain 10M precompile FAILED -- taking over from g $(date -u +%H:%M:%S)"
    kill_tree "$gpid"
    echo "== queue_r4m: grant settle 300s"
    sleep 300
    took_over=1
    break
  fi
  sleep 120
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

bench_10m () {
  # $1 = tag; remaining args = env assignments
  local tag=$1; shift
  probe || { echo "== queue_r4m: backend dead before 10M ($tag)"; return 1; }
  echo "== queue_r4m: 10M precompile ($tag) start $(date -u +%H:%M:%S)"
  env "$@" BENCH_PARTICLES=10000000 timeout 9000 \
    python scripts/precompile_10m.py \
    > "runs/bench/precompile_10m_${tag}_r4.log" 2>&1
  local rc=$?
  echo "== queue_r4m: precompile ($tag) rc=$rc $(date -u +%H:%M:%S)"
  [ $rc -eq 0 ] || return 1
  probe || { echo "== queue_r4m: backend dead before 10M bench ($tag)"; return 1; }
  echo "== queue_r4m: 10M bench ($tag) start $(date -u +%H:%M:%S)"
  env "$@" BENCH_PARTICLES=10000000 timeout 9000 python bench.py \
    > runs/bench/bench_10m_r4.json.tmp 2>> runs/bench/bench_10m_r4.log
  rc=$?
  if [ $rc -eq 0 ] && [ -s runs/bench/bench_10m_r4.json.tmp ]; then
    mv runs/bench/bench_10m_r4.json.tmp runs/bench/bench_10m_r4.json
    echo "== queue_r4m: 10M OK ($tag): $(cat runs/bench/bench_10m_r4.json)"
    return 0
  fi
  rm -f runs/bench/bench_10m_r4.json.tmp
  echo "== queue_r4m: 10M bench ($tag) FAILED rc=$rc"
  return 1
}

if [ -s runs/bench/bench_10m_r4.json ]; then
  echo "== queue_r4m: 10M already landed, skipping contingency"
else
  bench_10m split ARGON_SPLIT_REBUILD=1 \
    || bench_10m eager ARGON_EAGER_REBUILD=1 \
    || echo "== queue_r4m: all 10M paths exhausted this round"
fi

# ---- phases2 attribution ------------------------------------------
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

# ---- lever benches first (they decide round-5 defaults), then shapes --
run_point onepass BENCH_ONEPASS_TOPK=1
run_point all_levers BENCH_PACKED_LAYERS=1 BENCH_BF16_HIT=1 BENCH_ONEPASS_TOPK=1
run_point packed  BENCH_PACKED_LAYERS=1
run_point bf16hit BENCH_BF16_HIT=1
run_point cap16_occ11 BENCH_CELL_CAP=16 BENCH_CELL_OCC=11.0
run_point cap24_occ16 BENCH_CELL_CAP=24 BENCH_CELL_OCC=16.0
run_point cap16_occ8 BENCH_CELL_CAP=16 BENCH_CELL_OCC=8.0
run_point occskip_off BENCH_OCC_SKIP=0

echo "== queue_r4m: done $(date -u +%H:%M:%S)"
