#!/bin/bash
# Round-4 chip queue n: post-host-restart 10M ladder, EAGER FIRST.
#
# Context: the 2026-08-19 ~21:47 host restart wiped the machine
# (fresh checkout, ~/.cache/jax_argon gone) and killed queue m 38 min
# into the SPLIT 10M precompile.  Remaining wall clock this round is
# ~1 h, which changes the ladder order:
#   - split's sweep program is estimated at ~1/3 of the monolith's
#     >4 h remote compile (queue_r4m.sh rationale) -- likely over an
#     hour, i.e. it probably cannot land this session cold.
#   - eager mode's only large program is the K=8 step scan block
#     (engine.py: the rebuild, THE wall, runs per-op); best shot at a
#     real 10M number inside the budget.
#   - last rung: eager with K=1 -- the scan block shrinks to ONE step,
#     the smallest program shape the engine can emit.  Slower (rebuild
#     every step) but compile-guaranteed.
# After the 10M ladder: the 1M lever benches (round-5 default gates)
# from queue m's list, skipping any that already landed.
# ONE grant; strictly serial; bounded probe before each job; no
# pattern-matched kills anywhere.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/bench runs/profile
echo $$ > runs/queue_r4n.pid

probe () {
  for i in 1 2 3; do
    if timeout 420 python -c "import jax; print(jax.devices()[0].device_kind)" \
        > /dev/null 2>&1; then
      echo "== queue_r4n: probe ok (attempt $i) $(date -u +%H:%M:%S)"
      return 0
    fi
    echo "== queue_r4n: probe failed (attempt $i), cooling down 240s"
    sleep 240
  done
  return 1
}

bench_10m () {
  # $1 = tag, $2 = precompile timeout, $3 = bench timeout; rest = env.
  local tag=$1 pre_to=$2 bench_to=$3; shift 3
  probe || { echo "== queue_r4n: backend dead before 10M ($tag)"; return 1; }
  echo "== queue_r4n: 10M precompile ($tag) start $(date -u +%H:%M:%S)"
  env "$@" BENCH_PARTICLES=10000000 timeout "$pre_to" \
    python scripts/precompile_10m.py \
    > "runs/bench/precompile_10m_${tag}_r4.log" 2>&1
  local rc=$?
  echo "== queue_r4n: precompile ($tag) rc=$rc $(date -u +%H:%M:%S)"
  [ $rc -eq 0 ] || return 1
  echo "== queue_r4n: 10M bench ($tag) start $(date -u +%H:%M:%S)"
  env "$@" BENCH_PARTICLES=10000000 timeout "$bench_to" python bench.py \
    > runs/bench/bench_10m_r4.json.tmp 2>> runs/bench/bench_10m_r4.log
  rc=$?
  if [ $rc -eq 0 ] && [ -s runs/bench/bench_10m_r4.json.tmp ]; then
    mv runs/bench/bench_10m_r4.json.tmp runs/bench/bench_10m_r4.json
    echo "== queue_r4n: 10M OK ($tag): $(cat runs/bench/bench_10m_r4.json)"
    return 0
  fi
  rm -f runs/bench/bench_10m_r4.json.tmp
  echo "== queue_r4n: 10M bench ($tag) FAILED rc=$rc"
  return 1
}

if [ -s runs/bench/bench_10m_r4.json ]; then
  echo "== queue_r4n: 10M already landed, skipping ladder"
else
  bench_10m eager 1500 1800 ARGON_EAGER_REBUILD=1 \
    || bench_10m eager_k1 1200 1800 ARGON_EAGER_REBUILD=1 \
         BENCH_REBUILD_INTERVAL=1 BENCH_SPE=16 \
    || echo "== queue_r4n: all 10M rungs exhausted"
fi

run_point () {
  local tag=$1; shift
  if [ -s "runs/bench/bench_1m_${tag}.json" ]; then
    echo "== queue_r4n: $tag already landed, skipping"
    return 0
  fi
  probe || { echo "== queue_r4n: backend dead before $tag, aborting"; exit 1; }
  echo "== queue_r4n: $tag start $(date -u +%H:%M:%S)"
  env "$@" timeout 2700 python bench.py \
    > "runs/bench/bench_1m_${tag}.json.tmp" \
    2> "runs/bench/bench_1m_${tag}.log"
  local rc=$?
  if [ $rc -eq 0 ] && [ -s "runs/bench/bench_1m_${tag}.json.tmp" ]; then
    mv "runs/bench/bench_1m_${tag}.json.tmp" "runs/bench/bench_1m_${tag}.json"
    echo "== queue_r4n: $tag OK: $(cat runs/bench/bench_1m_${tag}.json)"
  else
    rm -f "runs/bench/bench_1m_${tag}.json.tmp"
    echo "== queue_r4n: $tag FAILED rc=$rc"
  fi
}

# Lever benches (round-5 default gates), in decision-value order.
run_point onepass BENCH_ONEPASS_TOPK=1
run_point all_levers BENCH_PACKED_LAYERS=1 BENCH_BF16_HIT=1 BENCH_ONEPASS_TOPK=1
run_point packed  BENCH_PACKED_LAYERS=1
run_point bf16hit BENCH_BF16_HIT=1
run_point cap16_occ11 BENCH_CELL_CAP=16 BENCH_CELL_OCC=11.0
run_point cap24_occ16 BENCH_CELL_CAP=24 BENCH_CELL_OCC=16.0

echo "== queue_r4n: done $(date -u +%H:%M:%S)"
