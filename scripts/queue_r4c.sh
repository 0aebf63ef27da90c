#!/bin/bash
# Round-4 chip queue, generation c: grant-settle wait, bounded liveness
# probe before every job, then profile -> slotkey probe -> 10M bench
# attempt #2 (phase-marked bench.py).  ONE grant; strictly serial.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/profile runs/probe runs/bench

probe () {
  # Bounded liveness probe in a throwaway subprocess; retries with
  # cooldowns (a killed TPU process can wedge the grant ~10 min).
  for i in 1 2 3 4; do
    if timeout 420 python -c "import jax; print(jax.devices()[0].device_kind)" \
        > /dev/null 2>&1; then
      echo "== queue_r4c: probe ok (attempt $i) $(date -u +%H:%M:%S)"
      return 0
    fi
    echo "== queue_r4c: probe failed (attempt $i), cooling down 300s"
    sleep 300
  done
  return 1
}

echo "== queue_r4c: settling grant 600s from $(date -u +%H:%M:%S)"
sleep 600

probe || { echo "== queue_r4c: backend dead, aborting"; exit 1; }
echo "== queue_r4c: profile start $(date -u +%H:%M:%S)"
timeout 2400 python scripts/profile_step.py 1000000 16 pairs 8 \
  > runs/profile/profile_1m_pairs_r4.txt 2> runs/profile/profile_1m_pairs_r4.log
echo "== queue_r4c: profile rc=$? $(date -u +%H:%M:%S)"

probe || { echo "== queue_r4c: backend dead, aborting"; exit 1; }
echo "== queue_r4c: slotkey start $(date -u +%H:%M:%S)"
timeout 2400 python scripts/probe_slotkey.py 1000000 \
  > runs/probe/slotkey_1m_r4.txt 2> runs/probe/slotkey_1m_r4.log
echo "== queue_r4c: slotkey rc=$? $(date -u +%H:%M:%S)"

probe || { echo "== queue_r4c: backend dead, aborting"; exit 1; }
echo "== queue_r4c: 10M attempt 2 start $(date -u +%H:%M:%S)"
BENCH_PARTICLES=10000000 timeout 14400 python bench.py \
  > runs/bench/bench_10m_r4.json.tmp 2>> runs/bench/bench_10m_r4.log
rc=$?
if [ $rc -eq 0 ] && [ -s runs/bench/bench_10m_r4.json.tmp ]; then
  mv runs/bench/bench_10m_r4.json.tmp runs/bench/bench_10m_r4.json
  echo "== queue_r4c: 10M OK: $(cat runs/bench/bench_10m_r4.json)"
else
  rm -f runs/bench/bench_10m_r4.json.tmp
  echo "== queue_r4c: 10M FAILED rc=$rc"
fi
echo "== queue_r4c: done $(date -u +%H:%M:%S)"
