"""Structured metrics logging (JSONL) + phase timing.

Replaces the reference's print-based observability (per-step collision
counts, OOB counts, phase runtimes; Open_Air_Pore_MC.py:512-557) with
machine-readable per-epoch records.
"""

from __future__ import annotations

import json
import time
from typing import IO, Optional

import numpy as np


def device_memory_stats() -> dict:
    """Device-memory telemetry (the reference's commented-out
    tracemalloc report, Open_Air_Cube_MC.py:94-117, re-imagined for the
    accelerator: HBM in use / peak / limit from the PJRT allocator).
    Returns {} when the backend does not expose memory_stats (e.g. the
    XLA:CPU test platform)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return {}
    keep = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
            "largest_alloc_size", "num_allocs")
    return {k: int(v) for k, v in stats.items() if k in keep}


class MetricsLogger:
    """JSONL writer for per-epoch simulation metrics.

    ``resume=False`` (a fresh run) truncates any stale file so records
    from a previous run in the same out-dir never interleave; ``resume=
    True`` appends.  Throughput is reported per epoch window (time since
    the previous record in THIS session), so it is meaningful across
    resumes; ``session_particle_steps_per_sec`` is the running session
    aggregate.
    """

    def __init__(self, path: Optional[str] = None, stream: Optional[IO] = None,
                 resume: bool = False):
        self._fh = open(path, "a" if resume else "w") if path else stream
        self._t0 = time.time()
        self._last = self._t0
        self._steps_done = 0

    def log_epoch(self, metrics, num_particles: int,
                  first_step: int) -> dict:
        m = {k: np.asarray(v) for k, v in vars(metrics).items()}
        n_steps = int(m["collisions"].shape[0])
        self._steps_done += n_steps
        now = time.time()
        window = max(now - self._last, 1e-9)
        self._last = now
        record = {
            "time": now,
            "elapsed_s": now - self._t0,
            "first_step": int(first_step),
            "steps": n_steps,
            "collisions": int(m["collisions"].sum()),
            "wall_hits": int(m["wall_hits"].sum()),
            "momentum_z_sum": float(m["momentum_z"].sum()),
            "energy_hot_sum": float(m["energy_hot"].sum()),
            "energy_cold_sum": float(m["energy_cold"].sum()),
            "oob_after_walls": int(m["oob_after_walls"].sum()),
            "oob_after_pairs": int(m["oob_after_pairs"].sum()),
            # Verlet-engine observability (zeros in sweep mode): epoch
            # sums of the rebuild/dirty/latency counters (state.py
            # StepMetrics docstrings).
            "rebuilds": int(m["rebuilt"].sum()),
            "dirty_count": int(m["dirty_count"].sum()),
            "latent_full": int(m["latent_full"].sum()),
            "teleports": int(m["teleports"].sum()),
            "latent_research": int(m["latent_research"].sum()),
            "particle_steps_per_sec": n_steps * num_particles / window,
            "session_particle_steps_per_sec": (
                self._steps_done * num_particles / max(now - self._t0, 1e-9)
            ),
        }
        mem = device_memory_stats()
        if mem:
            record["device_memory"] = mem
        if self._fh is not None:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        return record

    def close(self):
        if self._fh is not None:
            self._fh.close()


class PhaseTimer:
    """Wall-clock phase timing (reference time.time() deltas,
    Open_Air_Pore_MC.py:514-517) -- host-side, for coarse profiling;
    use jax.profiler for device traces."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self._start: dict[str, float] = {}

    def start(self, name: str):
        self._start[name] = time.time()

    def stop(self, name: str):
        self.totals[name] = self.totals.get(name, 0.0) + (
            time.time() - self._start.pop(name)
        )
