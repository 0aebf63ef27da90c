#!/bin/bash
# Round-4 chip queue i: fine-grained rebuild attribution + prototype
# levers (packed-layer assign, realistic-cast bf16 hit test), queued
# BEHIND the shape sweep (queue h).  The original phase probe died on
# a tunnel flake after landing the headline (table build = 62.8 ms of
# the 218 ms rebuild); this one splits that term and measures the two
# levers standalone so the post-10M default flips are data-driven.
# ONE grant; strictly serial; bounded probe before each job.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/profile
echo $$ > runs/queue_r4i.pid

# Wait for queue h to finish -- or to die without its done line (the
# orchestrator liveness check reads the exact cmdline, not just the
# pid: stale pidfiles bit us in queue f).
while ! grep -qs "queue_r4h: done\|aborting" runs/queue_r4h.log; do
  hpid=$(cat runs/queue_r4h.pid 2>/dev/null || true)
  if [ -n "${hpid:-}" ] \
     && ! grep -qsa "queue_r4h" "/proc/$hpid/cmdline" 2>/dev/null; then
    echo "== queue_r4i: queue h orchestrator gone, proceeding"
    break
  fi
  sleep 180
done

probe () {
  for i in 1 2 3 4; do
    if timeout 420 python -c "import jax; print(jax.devices()[0].device_kind)" \
        > /dev/null 2>&1; then
      echo "== queue_r4i: probe ok (attempt $i) $(date -u +%H:%M:%S)"
      return 0
    fi
    echo "== queue_r4i: probe failed (attempt $i), cooling down 300s"
    sleep 300
  done
  return 1
}

for attempt in 1 2; do
  probe || { echo "== queue_r4i: backend dead, aborting"; exit 1; }
  echo "== queue_r4i: phase probe v2 start (attempt $attempt) $(date -u +%H:%M:%S)"
  timeout 2400 python scripts/profile_rebuild_phases2.py \
    > runs/profile/rebuild_phases2_1m_r4.txt \
    2> runs/profile/rebuild_phases2_1m_r4.log
  rc=$?
  echo "== queue_r4i: phase probe v2 rc=$rc $(date -u +%H:%M:%S)"
  if [ $rc -eq 0 ] && grep -q "^done" runs/profile/rebuild_phases2_1m_r4.txt; then
    break
  fi
  echo "== queue_r4i: incomplete (tunnel flake?), cooling down 300s"
  sleep 300
done
echo "== queue_r4i: done $(date -u +%H:%M:%S)"
