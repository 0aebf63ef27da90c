#!/bin/bash
# Round-4 chip queue h: the rebuild-grid SHAPE sweep originally queued
# as queue_r4f (which died silently before running), re-gated BEHIND
# queue_r4g so the 10M north-star attempt gets the chip first.
# Measures the rebuild-grid shape levers at 1M: the sweep's dominant
# VPU term scales ~rows*cap^2 while spill-to-hot keeps any capacity
# coverage-exact and pairs_config_for's budgets follow the thinner
# Poisson tail.  Three points vs the shipping (occ 11, cap 24):
#   cap16_occ11 -- thin tail only (2.25x fewer hit/top-k lanes/row)
#   cap24_occ16 -- denser cells, fewer rows (same lanes/row)
#   cap16_occ8  -- middle point (near-zero spills at cap 16)
# ONE grant; strictly serial; bounded probe before each job.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/bench
until grep -q "queue_r4g: done" runs/queue_r4g.log 2>/dev/null; do
  sleep 120
done

probe () {
  for i in 1 2 3 4; do
    if timeout 420 python -c "import jax; print(jax.devices()[0].device_kind)" \
        > /dev/null 2>&1; then
      echo "== queue_r4h: probe ok (attempt $i) $(date -u +%H:%M:%S)"
      return 0
    fi
    echo "== queue_r4h: probe failed (attempt $i), cooling down 300s"
    sleep 300
  done
  return 1
}

run_point () {
  local tag=$1 cap=$2 occ=$3
  if [ -s "runs/bench/bench_1m_${tag}.json" ]; then
    echo "== queue_r4h: $tag already landed, skipping"
    return 0
  fi
  probe || { echo "== queue_r4h: backend dead before $tag, aborting"; exit 1; }
  echo "== queue_r4h: $tag start $(date -u +%H:%M:%S)"
  BENCH_CELL_CAP=$cap BENCH_CELL_OCC=$occ timeout 2700 python bench.py \
    > "runs/bench/bench_1m_${tag}.json.tmp" \
    2> "runs/bench/bench_1m_${tag}.log"
  local rc=$?
  if [ $rc -eq 0 ] && [ -s "runs/bench/bench_1m_${tag}.json.tmp" ]; then
    mv "runs/bench/bench_1m_${tag}.json.tmp" "runs/bench/bench_1m_${tag}.json"
    echo "== queue_r4h: $tag OK: $(cat runs/bench/bench_1m_${tag}.json)"
  else
    rm -f "runs/bench/bench_1m_${tag}.json.tmp"
    echo "== queue_r4h: $tag FAILED rc=$rc"
  fi
}

run_point cap16_occ11 16 11.0
run_point cap24_occ16 24 16.0
run_point cap16_occ8 16 8.0
echo "== queue_r4h: done $(date -u +%H:%M:%S)"
