#!/bin/bash
# Rebuild the TPU + CPU compile caches unattended (VERDICT r4 item 8).
#
# The 2026-08-19 host restart wiped the durable compile cache right
# before the 10M attempt needed it, costing round 4 its north-star
# shot; this script recreates every program the bench/dryrun/test
# surfaces need, from cold, without supervision.  Run it whenever a
# wipe is detected (the cache dir ~/.cache/jax_argon missing or
# near-empty) AND the chip is free -- it takes the single tunneled
# TPU grant for its first two phases.
#
# Phases (each bounded; a failure falls through to the next):
#   1. TPU 1M  -- the shipping bench program set (fused window at
#      N<=2M, init, epilogue): what `python bench.py` needs.
#   2. TPU 10M -- the eager-rebuild ladder programs (init ops + K-step
#      scan block): what the north-star bench needs.  Resumable: each
#      completed compile lands in the durable cache even if a later
#      one stalls (scripts/precompile_10m.py).
#   3. CPU dryrun -- the 8-device sharded training-step program.
#   4. CPU test suite -- every CPU program the tests compile.
#
# Usage: nohup bash scripts/warm_caches.sh & (logs to runs/warm_caches.log)
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
LOG=runs/warm_caches.log
{
  echo "== warm_caches start $(date -u +%F' '%T) cache=$(du -sh \
    "${JAX_CACHE_DIR:-$HOME/.cache/jax_argon}" 2>/dev/null | cut -f1)"

  echo "== phase 1: 1M bench programs $(date -u +%T)"
  BENCH_PARTICLES=1000000 timeout 3600 python scripts/precompile_10m.py \
    && echo "== phase 1 ok" || echo "== phase 1 rc=$?"

  echo "== phase 2: 10M eager programs $(date -u +%T)"
  BENCH_PARTICLES=10000000 ARGON_EAGER_REBUILD=1 timeout 10800 \
    python scripts/precompile_10m.py \
    && echo "== phase 2 ok" || echo "== phase 2 rc=$?"

  echo "== phase 3: CPU multichip dryrun $(date -u +%T)"
  env -u PALLAS_AXON_POOL_IPS timeout 1800 \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)" \
    && echo "== phase 3 ok" || echo "== phase 3 rc=$?"

  echo "== phase 4: CPU test-suite programs $(date -u +%T)"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 timeout 3600 \
    python -m pytest tests/ -q -x \
    && echo "== phase 4 ok" || echo "== phase 4 rc=$?"

  echo "== warm_caches done $(date -u +%F' '%T) cache=$(du -sh \
    "${JAX_CACHE_DIR:-$HOME/.cache/jax_argon}" 2>/dev/null | cut -f1)"
} >> "$LOG" 2>&1
