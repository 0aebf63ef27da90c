#!/bin/bash
# Round-4 bridge: queue_r4f died silently (empty log, PID gone) while
# queue_r4g gates on "queue_r4f: done".  The 10M north star (VERDICT
# item 1) outranks the shape sweep, so instead of restarting f ahead
# of g, this bridge waits for queue_r4e to drain and then satisfies
# g's gate directly.  The shape sweep is re-queued as queue_r4h AFTER
# g (the 10M attempt) completes.
set -u
cd "$(dirname "$0")/.."
until grep -q "queue_r4e: done" runs/queue_r4e.log 2>/dev/null; do
  sleep 60
done
echo "== queue_r4f: superseded by bridge (f died; shape sweep moved to queue_r4h) $(date -u +%H:%M:%S)" >> runs/queue_r4f.log
echo "== queue_r4f: done $(date -u +%H:%M:%S)" >> runs/queue_r4f.log
