#!/bin/bash
# Round-4 chip queue g (v2): after the 1M shape sweep (queue f) drains:
#   1. rebuild phase attribution at 1M (~10 min incl. compiles)
#   2. overnight 10M attempt 3 IF attempt 2 failed -- resumable
#      precompile first (each completed program lands in the durable
#      cache even if a later one stalls; the compile-scaling probe
#      showed the wall is the remote service, so the strategy is long
#      timeouts against a cache that only ever grows), then the bench.
# ONE grant; strictly serial.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/bench runs/profile
until grep -q "queue_r4f: done" runs/queue_r4f.log 2>/dev/null; do
  sleep 120
done

probe () {
  for i in 1 2 3 4; do
    if timeout 420 python -c "import jax; print(jax.devices()[0].device_kind)" \
        > /dev/null 2>&1; then
      echo "== queue_r4g: probe ok (attempt $i) $(date -u +%H:%M:%S)"
      return 0
    fi
    echo "== queue_r4g: probe failed (attempt $i), cooling down 300s"
    sleep 300
  done
  return 1
}

probe || { echo "== queue_r4g: backend dead, aborting"; exit 1; }
echo "== queue_r4g: rebuild phases start $(date -u +%H:%M:%S)"
timeout 2400 python scripts/profile_rebuild_phases.py \
  > runs/profile/rebuild_phases_1m_r4.txt \
  2> runs/profile/rebuild_phases_1m_r4.log
echo "== queue_r4g: rebuild phases rc=$? $(date -u +%H:%M:%S)"

if [ -s runs/bench/bench_10m_r4.json ]; then
  echo "== queue_r4g: 10M already landed, done"
  exit 0
fi

probe || { echo "== queue_r4g: backend dead, aborting"; exit 1; }
echo "== queue_r4g: 10M precompile start $(date -u +%H:%M:%S)"
BENCH_PARTICLES=10000000 timeout 25200 python scripts/precompile_10m.py \
  > runs/bench/precompile_10m_r4.log 2>&1
echo "== queue_r4g: precompile rc=$? $(date -u +%H:%M:%S)"

probe || { echo "== queue_r4g: backend dead before bench, aborting"; exit 1; }
echo "== queue_r4g: 10M attempt 3 start $(date -u +%H:%M:%S)"
BENCH_PARTICLES=10000000 timeout 10800 python bench.py \
  > runs/bench/bench_10m_r4.json.tmp 2>> runs/bench/bench_10m_r4.log
rc=$?
if [ $rc -eq 0 ] && [ -s runs/bench/bench_10m_r4.json.tmp ]; then
  mv runs/bench/bench_10m_r4.json.tmp runs/bench/bench_10m_r4.json
  echo "== queue_r4g: 10M OK: $(cat runs/bench/bench_10m_r4.json)"
else
  rm -f runs/bench/bench_10m_r4.json.tmp
  echo "== queue_r4g: 10M FAILED rc=$rc"
fi
echo "== queue_r4g: done $(date -u +%H:%M:%S)"
