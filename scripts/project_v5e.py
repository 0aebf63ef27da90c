"""Nominal-v5e throughput projection from measured per-block times.

VERDICT r4 item 5: the 1e9 north-star story rested on a four-line
prose scaling argument (COMPONENTS.md roofline).  This script is the
reproducible version: it takes (a) the measured per-block device-time
decomposition of the 1M step (r4 fusion profile,
runs/profile/profile_1m_pairs_r4.txt), (b) the committed hardware
calibration of the attached throttled chip vs nominal v5e, with
stated uncertainty, and emits the projected nominal-v5e step time and
particle-steps/sec/chip WITH ERROR BARS, plus the pre-registered
K-retuning plan (the program-shape changes worth re-measuring the day
full-ratio hardware appears).

The projection is a lower-bound-style model: each block's time is
divided by its bound unit's nominal/measured speed ratio; blocks
bound by a unit mix use the worst (smallest) ratio of the mix for the
high-time bound and the best for the low-time bound.  No fusion or
retuning wins are assumed in the headline number -- the K-retuning
deltas are reported separately as upside.

Usage: python scripts/project_v5e.py [out.json]
        (pure host arithmetic -- no jax, no device)
"""

from __future__ import annotations

import json
import os
import sys

# --- Inputs -----------------------------------------------------------
# Measured per-block step decomposition at 1M particles, K=8, f32
# (device time from the r4 jax.profiler fusion breakdown,
# runs/profile/profile_1m_pairs_r4.txt; table in COMPONENTS.md
# "Per-step cost profile at 1M").  ms per step.
BLOCKS = {
    # name: (ms_per_step, bound_units)
    "rebuild_sweep_minpasses": (15.0, ("vpu",)),
    "rebuild_sweep_gathers": (1.6, ("gather",)),
    "rebuild_table_pack_emit": (9.0, ("vpu", "gather", "hbm")),
    "perstep_pair_gathers": (4.1, ("gather",)),
    "perstep_sorts": (1.7, ("vpu", "hbm")),
    "physics_walls_measure": (3.4, ("hbm",)),
    "dispatch_other": (3.7, ("fixed",)),
}
MEASURED_STEP_MS = sum(v[0] for v in BLOCKS.values())  # 38.5
N_PARTICLES = 1_000_000

# Hardware calibration: attached "v5 lite" grant vs nominal v5e
# (COMPONENTS.md roofline; measured by scripts/probe_* in r3/r4).
# ratio = nominal speed / measured speed, with +-35% calibration
# uncertainty (the unit microbenches vary run-to-run through the
# tunnel by about that much).
RATIOS = {
    "vpu": 26.0,     # ~0.15 T lane-ops/s measured vs ~4 T nominal
    "hbm": 8.2,      # ~100 GB/s effective vs 819 nominal
    "gather": 8.0,   # ~7 ns/row; gather machinery tracks HBM rows
    "fixed": 4.0,    # dispatch/tunnel overhead: assume a conservative
                     # 4x improvement on local (untunneled) hardware
}
CAL_UNCERTAINTY = 0.35

# Pre-registered K-retuning plan (run the day real hardware appears):
# on a full-ratio VPU the rebuild stops dominating, so the amortization
# window K and the cell capacity should be re-sized by the same
# lambda-aware formulas the engine already uses
# (config.pairs_cell_capacity_for, engine.pairs_config_for).  The rows
# below restate the program shapes to sweep, with the amortization
# factor each applies to the REBUILD blocks only.
K_RETUNE = [
    {"rebuild_interval": 8, "note": "shipping config (this projection)",
     "rebuild_scale": 1.0},
    {"rebuild_interval": 16,
     "note": "halves amortized rebuild; reach grows ~2x -> pair list "
             "~2.4x wider (lambda-aware sizing), per-step gathers "
             "~2.4x -- profitable iff gathers are >=8x cheaper, which "
             "is exactly the nominal-hardware calibration",
     "rebuild_scale": 0.5, "perstep_gather_scale": 2.4},
    {"rebuild_interval": 24,
     "note": "third the amortized rebuild; pair list ~3.8x; only pays "
             "if the VPU ratio lands at the high end",
     "rebuild_scale": 1.0 / 3.0, "perstep_gather_scale": 3.8},
]


def project(ratios: dict[str, float]) -> float:
    """Projected nominal-v5e step time (ms) under a ratio assignment."""
    total = 0.0
    for _name, (ms, units) in BLOCKS.items():
        r = min(ratios[u] for u in units)
        total += ms / r
    return total


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        "runs", "projection_v5e.json")

    mid = project(RATIOS)
    # Error bars: all ratios jointly at the low / high calibration edge,
    # and for mixed blocks the unit choice already takes the worst case
    # (min ratio) in `project` -- so the band below is the calibration
    # band, not a block-assignment band.
    lo_t = project({k: v * (1 + CAL_UNCERTAINTY) for k, v in RATIOS.items()})
    hi_t = project({k: v * (1 - CAL_UNCERTAINTY) for k, v in RATIOS.items()})

    def ps(ms):
        return N_PARTICLES / (ms / 1e3)

    retune = []
    for plan in K_RETUNE:
        t = 0.0
        for name, (ms, units) in BLOCKS.items():
            r = min(RATIOS[u] for u in units)
            scale = 1.0
            if name.startswith("rebuild_"):
                scale = plan["rebuild_scale"]
            if name == "perstep_pair_gathers":
                scale = plan.get("perstep_gather_scale", 1.0)
            t += ms * scale / r
        retune.append({
            "rebuild_interval": plan["rebuild_interval"],
            "projected_step_ms": round(t, 3),
            "projected_ps_per_sec": ps(t),
            "note": plan["note"],
        })

    # Reconciliation with the r4 COMPONENTS.md prose (4.0-4.5e8):
    # that argument let mixed blocks ride their FASTEST unit's ratio
    # and treated dispatch as tunnel-only (vanishes locally).  Stated
    # as the explicit optimistic scenario rather than the headline.
    opt = 0.0
    for name, (ms, units) in BLOCKS.items():
        if units == ("fixed",):
            continue
        opt += ms / max(RATIOS[u] for u in units)

    result = {
        "metric": "projected particle-steps/sec/chip on NOMINAL v5e "
                  "(model, not a measurement)",
        "basis": {
            "measured_step_ms_1m": MEASURED_STEP_MS,
            "measured_ps_per_sec": ps(MEASURED_STEP_MS),
            "blocks_ms": {k: v[0] for k, v in BLOCKS.items()},
            "block_bound_units": {k: list(v[1]) for k, v in BLOCKS.items()},
            "unit_ratios_nominal_over_measured": RATIOS,
            "calibration_uncertainty": CAL_UNCERTAINTY,
            "source": "runs/profile/profile_1m_pairs_r4.txt + "
                      "COMPONENTS.md roofline calibration",
        },
        "projected_step_ms": {"mid": round(mid, 3),
                              "fast": round(lo_t, 3),
                              "slow": round(hi_t, 3)},
        "projected_ps_per_sec": {"mid": ps(mid),
                                 "high": ps(lo_t),
                                 "low": ps(hi_t)},
        "vs_north_star_1e9": {"mid": ps(mid) / 1e9,
                              "high": ps(lo_t) / 1e9,
                              "low": ps(hi_t) / 1e9},
        "optimistic_scenario": {
            "assumptions": "mixed blocks ride their fastest unit's "
                           "ratio; dispatch is tunnel-only and "
                           "vanishes on local hardware (the r4 "
                           "COMPONENTS.md prose argument)",
            "projected_step_ms": round(opt, 3),
            "projected_ps_per_sec": ps(opt),
            "vs_north_star_1e9": ps(opt) / 1e9,
        },
        "k_retune_plan": retune,
        "caveats": [
            "Per-particle costs were measured flat 1M->4M on the "
            "attached chip; the 10M bench (this round) checks the "
            "flatness the 10M projection relies on.",
            "The 'fixed' dispatch block's 4x is the weakest ratio "
            "(tunnel overhead does not exist on local hardware; 4x "
            "is deliberately conservative).",
            "No Pallas rotation-form sweep or fusion wins assumed; "
            "those are upside recorded in ARCHITECTURE.md.",
        ],
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({
        "projected_ps_per_sec_mid": result["projected_ps_per_sec"]["mid"],
        "band": [result["projected_ps_per_sec"]["low"],
                 result["projected_ps_per_sec"]["high"]],
        "vs_north_star_mid": result["vs_north_star_1e9"]["mid"],
        "best_k_retune": max(retune, key=lambda r: r["projected_ps_per_sec"])
        ["rebuild_interval"],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
