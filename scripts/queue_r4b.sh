#!/bin/bash
# Round-4 follow-up TPU queue: waits for queue_r4.sh (bench jobs) to
# finish, then serially runs the step profile and the slotkey decision
# probe (VERDICT r3 items 4 and 3).  ONE grant -- never overlap chip
# processes; the wait keys off queue_r4.log's completion marker.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/profile runs/probe

until grep -q "queue_r4: done" runs/bench/queue_r4.log 2>/dev/null; do
  sleep 60
done

echo "== queue_r4b: start $(date -u +%H:%M:%S)"
timeout 3600 python scripts/profile_step.py 1000000 16 pairs 8 \
  > runs/profile/profile_1m_pairs_r4.txt 2> runs/profile/profile_1m_pairs_r4.log
echo "== queue_r4b: profile rc=$? $(date -u +%H:%M:%S)"
timeout 3600 python scripts/probe_slotkey.py 1000000 \
  > runs/probe/slotkey_1m_r4.txt 2> runs/probe/slotkey_1m_r4.log
echo "== queue_r4b: slotkey rc=$? $(date -u +%H:%M:%S)"
echo "== queue_r4b: done"
