#!/bin/bash
# Round-4 chip queue k: engine-level 1M merge-gate benches for the two
# default-off rebuild levers landed in 3e24da9 (packed-layer assign,
# widened-superset bf16 hit test), queued BEHIND the phase probe
# (queue k).  phases2 measures the op-level prototypes standalone;
# these points measure the real engine programs end-to-end at 1M so a
# default flip is justified by the same artifact class as every other
# merge decision (compare vs bench_1m_r4.json, 2.54e7 plain).
# ONE grant; strictly serial; bounded probe before each job.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/bench
echo $$ > runs/queue_r4l.pid

# Wait for queue k to finish -- or for its orchestrator to die without
# the done line (liveness by exact cmdline, not pid: queue-f lesson).
while ! grep -qs "queue_r4k: done\|aborting" runs/queue_r4k.log; do
  ipid=$(cat runs/queue_r4k.pid 2>/dev/null || true)
  if [ -n "${ipid:-}" ] \
     && ! grep -qsa "queue_r4k" "/proc/$ipid/cmdline" 2>/dev/null; then
    echo "== queue_r4l: queue k orchestrator gone, proceeding"
    break
  fi
  sleep 180
done

probe () {
  for i in 1 2 3 4; do
    if timeout 420 python -c "import jax; print(jax.devices()[0].device_kind)" \
        > /dev/null 2>&1; then
      echo "== queue_r4l: probe ok (attempt $i) $(date -u +%H:%M:%S)"
      return 0
    fi
    echo "== queue_r4l: probe failed (attempt $i), cooling down 300s"
    sleep 300
  done
  return 1
}

run_point () {
  local tag=$1; shift
  if [ -s "runs/bench/bench_1m_${tag}.json" ]; then
    echo "== queue_r4l: $tag already landed, skipping"
    return 0
  fi
  probe || { echo "== queue_r4l: backend dead before $tag, aborting"; exit 1; }
  echo "== queue_r4l: $tag start $(date -u +%H:%M:%S)"
  env "$@" timeout 2700 python bench.py \
    > "runs/bench/bench_1m_${tag}.json.tmp" \
    2> "runs/bench/bench_1m_${tag}.log"
  local rc=$?
  if [ $rc -eq 0 ] && [ -s "runs/bench/bench_1m_${tag}.json.tmp" ]; then
    mv "runs/bench/bench_1m_${tag}.json.tmp" "runs/bench/bench_1m_${tag}.json"
    echo "== queue_r4l: $tag OK: $(cat runs/bench/bench_1m_${tag}.json)"
  else
    rm -f "runs/bench/bench_1m_${tag}.json.tmp"
    echo "== queue_r4l: $tag FAILED rc=$rc"
  fi
}

run_point occskip_off BENCH_OCC_SKIP=0
echo "== queue_r4l: done $(date -u +%H:%M:%S)"
