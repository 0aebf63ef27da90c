#!/bin/bash
# Round-4 chip queue d: after queue_r4c (10M attempt 2) drains, run the
# bf16 VPU probe.  ONE grant; waits on the r4c completion marker.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/probe
until grep -q "queue_r4c: done" runs/queue_r4c.log 2>/dev/null; do
  sleep 60
done
for i in 1 2 3; do
  timeout 420 python -c "import jax; jax.devices()" >/dev/null 2>&1 && break
  sleep 300
done
echo "== queue_r4d: bf16 probe start $(date -u +%H:%M:%S)"
timeout 1800 python scripts/probe_bf16_vpu.py \
  > runs/probe/bf16_vpu_r4.txt 2> runs/probe/bf16_vpu_r4.log
echo "== queue_r4d: bf16 probe rc=$? $(date -u +%H:%M:%S)"
echo "== queue_r4d: done"
