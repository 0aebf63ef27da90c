#!/bin/bash
# Round-4 chip queue g: overnight 10M attempt 3, IF attempt 2 failed.
# Strategy per the compile-scaling probe (scripts/compile_scaling_probe.py:
# XLA:CPU compiles the identical split programs in 4-8 s FLAT across
# 1M/4M/10M -- the 10M wall is entirely the remote TPU compile
# service): wait it out with a resumable shape -- precompile_10m.py
# first (rebuild program's cache entry lands even if the block compile
# stalls and the process dies), long timeouts, then the bench loads
# everything from the durable cache.  ONE grant; strictly serial.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/bench
until grep -q "queue_r4f: done" runs/queue_r4f.log 2>/dev/null; do
  sleep 120
done
if [ -s runs/bench/bench_10m_r4.json ]; then
  echo "== queue_r4g: 10M already landed, nothing to do"
  exit 0
fi

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
