#!/bin/bash
# Round-4 serialized TPU job queue (ONE grant -- never run two chip
# processes at once; memory: tpu-tunnel-flakiness).  Logs + artifacts go
# to durable repo paths, compile cache to ~/.cache/jax_argon (bench.py
# default).  Job 1 (1M) warms the cache the 10M programs share (the
# split rebuild/block programs lower to scale-invariant StableHLO).
set -u
cd "$(dirname "$0")/.."
BENCHDIR=runs/bench
mkdir -p "$BENCHDIR"

run_bench () {
  local n="$1" tag="$2" tmo="$3"
  echo "== queue_r4: N=$n ($tag) timeout=${tmo}s start $(date -u +%H:%M:%S)"
  BENCH_PARTICLES="$n" timeout "$tmo" python bench.py \
    > "$BENCHDIR/bench_${tag}.json.tmp" 2> "$BENCHDIR/bench_${tag}.log"
  local rc=$?
  if [ $rc -eq 0 ] && [ -s "$BENCHDIR/bench_${tag}.json.tmp" ]; then
    mv "$BENCHDIR/bench_${tag}.json.tmp" "$BENCHDIR/bench_${tag}.json"
    echo "== queue_r4: $tag OK: $(cat "$BENCHDIR/bench_${tag}.json")"
  else
    rm -f "$BENCHDIR/bench_${tag}.json.tmp"
    echo "== queue_r4: $tag FAILED rc=$rc (see $BENCHDIR/bench_${tag}.log)"
  fi
  return $rc
}

run_bench 1000000 1m_r4 2700
run_bench 10000000 10m_r4 14400
echo "== queue_r4: done $(date -u +%H:%M:%S)"
