"""Device tracing helpers (the reference's only profiling is wall-clock
prints, SURVEY.md section 5 "Tracing / profiling").

Two levels here:
* ``trace()`` -- context manager around jax.profiler capturing a device
  trace viewable in TensorBoard/Perfetto;
* ``op_breakdown()`` -- parses the captured Chrome trace and returns the
  per-fusion device-time table (the tool used to drive this framework's
  own TPU optimization; see ARCHITECTURE.md).
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    with jax.profiler.trace(log_dir):
        yield


def op_breakdown(log_dir: str, top: int = 30):
    """[(device_ms, count, op_name)] aggregated from a captured trace."""
    files = glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    events = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            events += json.load(fh).get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(
                e.get("pid"), ""):
            dur[e.get("name", "?")] += e["dur"]
            cnt[e.get("name", "?")] += 1
    return [(d / 1000.0, cnt[name], name) for name, d in
            dur.most_common(top)]
