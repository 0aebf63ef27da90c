#!/bin/bash
# Round-5 chip queue a: the 10M ladder, FIRST ACTION of the round with
# multi-hour budgets (VERDICT r4 "Next round" item 1).
#
# Ladder rationale (from the r4 evidence):
#   - The fused monolith is dead: six attempts, 2.5-5 h timeouts and
#     transport flakes (COMPONENTS.md "night-of takeover").
#   - EAGER K=8 first: the only large program is the 8-step scan block
#     (the rebuild, the known wall, runs per-op).  The r4n attempt had
#     init done at +263 s and was killed after only ~20 min of block
#     compile (timeout 1500); this rung gives the block 3 h.
#   - EAGER K=1 floor: the scan block shrinks to ONE step -- the
#     smallest program the engine can emit.  Slower (rebuild every
#     step) but the best compile-success odds of any shape.
#   - SPLIT upgrade (run at the END of the round-5 chip work, budget
#     permitting): tables|sweep|epilogue rebuild programs; the K-step
#     block is ALREADY cached by the eager rung (the block program is
#     identical across rebuild modes -- engine.py builds the block
#     from the same step fn; tested bitwise fused/split/eager), so
#     only the sweep program (est. ~1/3 of the monolith compile) is
#     new.  A jitted rebuild should lift the eager 10M number ~1.3x.
#
# Knobs pinned by ENV for every rung (so config.py default flips made
# elsewhere this round cannot desync precompile vs bench programs):
#   BENCH_PACKED_LAYERS=1  -- the one measured r4 lever win (+1.3%)
#   BENCH_OCC_SKIP=0       -- measured -4% at 1M (bench_1m_r4b); the
#                             same-session A/B re-check runs later in
#                             the round, but the 10M ladder takes the
#                             current best point estimate.
#   BENCH_BF16_HIT=0, BENCH_ONEPASS_TOPK=0 -- measured ~0 / -8.6%.
#
# Stale-safety: BENCH_STALE_EXIT_NONZERO=1 everywhere + a '"stale"'
# grep before any mv (ADVICE r4 high: a stale fallback must never be
# committed as a landed measurement).
#
# ONE grant; strictly serial; bounded probe before each job; no
# pattern-matched kills anywhere.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/bench
echo $$ > runs/queue_r5a.pid

export BENCH_STALE_EXIT_NONZERO=1
KNOBS=(BENCH_PACKED_LAYERS=1 BENCH_OCC_SKIP=0 BENCH_BF16_HIT=0
       BENCH_ONEPASS_TOPK=0)

probe () {
  for i in 1 2 3; do
    if timeout 420 python -c "import jax; print(jax.devices()[0].device_kind)" \
        > /dev/null 2>&1; then
      echo "== queue_r5a: probe ok (attempt $i) $(date -u +%H:%M:%S)"
      return 0
    fi
    echo "== queue_r5a: probe failed (attempt $i), cooling down 240s"
    sleep 240
  done
  return 1
}

bench_10m () {
  # $1 = tag, $2 = precompile timeout, $3 = bench timeout; rest = env.
  local tag=$1 pre_to=$2 bench_to=$3; shift 3
  probe || { echo "== queue_r5a: backend dead before 10M ($tag)"; return 1; }
  echo "== queue_r5a: 10M precompile ($tag) start $(date -u +%H:%M:%S), budget ${pre_to}s"
  env "${KNOBS[@]}" "$@" BENCH_PARTICLES=10000000 timeout "$pre_to" \
    python scripts/precompile_10m.py \
    > "runs/bench/precompile_10m_${tag}_r5.log" 2>&1
  local rc=$?
  echo "== queue_r5a: precompile ($tag) rc=$rc $(date -u +%H:%M:%S)"
  [ $rc -eq 0 ] || return 1
  echo "== queue_r5a: 10M bench ($tag) start $(date -u +%H:%M:%S)"
  env "${KNOBS[@]}" "$@" BENCH_PARTICLES=10000000 \
    BENCH_SELF_DEADLINE=$((bench_to - 300)) timeout "$bench_to" \
    python bench.py \
    > runs/bench/bench_10m_r5.json.tmp 2>> "runs/bench/bench_10m_${tag}_r5.log"
  rc=$?
  if [ $rc -eq 0 ] && [ -s runs/bench/bench_10m_r5.json.tmp ] \
      && ! grep -q '"stale": true' runs/bench/bench_10m_r5.json.tmp; then
    mv runs/bench/bench_10m_r5.json.tmp "runs/bench/bench_10m_${tag}_r5.json"
    cp "runs/bench/bench_10m_${tag}_r5.json" runs/bench/bench_10m_r5.json
    echo "== queue_r5a: 10M OK ($tag): $(cat runs/bench/bench_10m_r5.json)"
    return 0
  fi
  rm -f runs/bench/bench_10m_r5.json.tmp
  echo "== queue_r5a: 10M bench ($tag) FAILED rc=$rc"
  return 1
}

if [ -s runs/bench/bench_10m_r5.json ]; then
  echo "== queue_r5a: 10M already landed, skipping ladder"
else
  bench_10m eager 10800 3600 ARGON_EAGER_REBUILD=1 \
    || bench_10m eager_k1 7200 3600 ARGON_EAGER_REBUILD=1 \
         BENCH_REBUILD_INTERVAL=1 BENCH_SPE=16 \
    || echo "== queue_r5a: all eager 10M rungs exhausted"
fi

echo "== queue_r5a: done $(date -u +%H:%M:%S)"
