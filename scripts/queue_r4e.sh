#!/bin/bash
# Round-4 chip queue e: after queue_r4d, re-bench 1M on the current
# working tree (occupancy-skip rebuild).  ONE grant; serial.
set -u
cd "$(dirname "$0")/.."
until grep -q "queue_r4d: done" runs/queue_r4d.log 2>/dev/null; do
  sleep 60
done
for i in 1 2 3; do
  timeout 420 python -c "import jax; jax.devices()" >/dev/null 2>&1 && break
  sleep 300
done
echo "== queue_r4e: 1M re-bench (occupancy-skip) start $(date -u +%H:%M:%S)"
timeout 2700 python bench.py > runs/bench/bench_1m_r4b.json.tmp \
  2> runs/bench/bench_1m_r4b.log
rc=$?
if [ $rc -eq 0 ] && [ -s runs/bench/bench_1m_r4b.json.tmp ]; then
  mv runs/bench/bench_1m_r4b.json.tmp runs/bench/bench_1m_r4b.json
  echo "== queue_r4e: OK: $(cat runs/bench/bench_1m_r4b.json)"
else
  rm -f runs/bench/bench_1m_r4b.json.tmp
  echo "== queue_r4e: FAILED rc=$rc"
fi
echo "== queue_r4e: done"
