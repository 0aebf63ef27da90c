"""Run the COMPLETE reference north-star experiment end-to-end.

Temperature_Pore at full reference scale: 557,649 molecules x 20,000
timesteps (nmft=20 x 1000 steps/mft) -- the run the reference scripts
perform on a multiprocessing CPU farm.  Writes every reference artifact
(8 histogram txt files, momentum_energy.csv with all 20,000 rows,
metrics.jsonl) and compares the final free-path histogram densities and
mean free paths against the reference's committed artifact files.

The committed hist_* files are "the most current values from the author
for the latest simulation" (reference README.md:23); which stage wrote
them is not recorded, so the comparison below is reported as evidence,
not asserted as a hard gate.

Usage (TPU host): python scripts/full_reference_run.py [--steps 20000]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import argparse
import json
import os
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--reference-dir", type=str, default="/root/reference")
    ap.add_argument("--stage", default="temperature_pore",
                    choices=["temperature_pore", "pore"],
                    help="pore = Open_Air_Pore_MC stage 2 (all-specular "
                         "walls, same N=557,649 and 20,000 steps; the "
                         "reference ships no stage-labelled artifacts "
                         "for it, so no committed-hist comparison)")
    ap.add_argument("--narrowphase", default="pairs",
                    choices=["sweep", "pairs"])
    ap.add_argument("--rebuild-interval", type=int, default=8)
    args = ap.parse_args()
    if args.out is None:
        args.out = ("runs/full_temperature_pore"
                    if args.stage == "temperature_pore" else "runs/pore")

    import jax

    import argon_monte_carlo_tpu as amc
    from argon_monte_carlo_tpu.analysis import path_statistics
    from argon_monte_carlo_tpu.io import writers

    eng = amc.EngineConfig(
        dtype="float32", broadphase="cells", steps_per_epoch=200,
        narrowphase=args.narrowphase,
        rebuild_interval=(args.rebuild_interval
                          if args.narrowphase == "pairs" else 1),
    )
    if args.stage == "temperature_pore":
        cfg = amc.temperature_pore_config(engine=eng)
    else:
        cfg = amc.PoreConfig(engine=eng)
    os.makedirs(args.out, exist_ok=True)
    sim = amc.Simulation(amc.make_workload(cfg))
    n = cfg.num_molecules
    print(f"full run: N={n} steps={args.steps} "
          f"narrowphase={args.narrowphase}", file=sys.stderr)
    t0 = time.time()
    done = [0]

    def progress(em):
        done[0] += int(em.momentum_z.shape[0])
        el = time.time() - t0
        print(f"  {done[0]}/{args.steps} steps, {el/60:.1f} min, "
              f"{done[0]*n/el:.3e} ps/s", file=sys.stderr, flush=True)

    state, measure, metrics = sim.run(num_steps=args.steps,
                                      epoch_callback=progress)
    # Host pull forces true completion (tunnel block_until_ready can
    # return early; see bench.py).
    float(state.pos[:, 2].sum())
    elapsed = time.time() - t0
    print(f"completed in {elapsed/60:.1f} min "
          f"({args.steps * n / elapsed:.3e} particle-steps/s)",
          file=sys.stderr)

    writers.write_histograms(measure, cfg.engine.num_bins,
                             cfg.engine.hist_range, args.out)
    if args.stage == "temperature_pore":
        # The v1 pore reference script keeps no ledger and writes no
        # CSV (Open_Air_Pore_MC.py:564-636).
        writers.write_momentum_energy_csv(
            np.asarray(metrics.momentum_z, np.float64),
            np.asarray(metrics.energy_cold, np.float64),
            np.asarray(metrics.energy_hot, np.float64),
            os.path.join(args.out, "momentum_energy.csv"),
        )
    stats = path_statistics(measure, cfg.engine.num_bins,
                            cfg.engine.hist_range)

    # Compare final histogram densities to the committed reference files.
    report = {
        "elapsed_min": elapsed / 60.0,
        "particle_steps_per_sec": args.steps * n / elapsed,
        "narrowphase": args.narrowphase,
        "mean_free_path": stats.mean_free_path,
        "analytic_lambda": cfg.physics.lambda_mfp,
        "mfp_over_lambda": stats.mean_free_path
        / cfg.physics.lambda_mfp,
        "mean_xyz": [stats.mean_x_free_path, stats.mean_y_free_path,
                     stats.mean_z_free_path],
        "completed_paths": stats.num_completed_paths,
        "collisions": int(measure.collision_count),
        "errs": int(measure.err_count),
        "overflow": int(measure.overflow_count),
        "hist_drops": int(getattr(measure, "hist_drop_count", 0)),
    }
    # Exponential free-path fit (reference graph_sim_data.py): the MFP
    # the reference extracts from the histogram tail.
    report["exp_fit_mfp"] = float(stats.fitted_mfp)

    from argon_monte_carlo_tpu.io.writers import read_reference_histogram

    # The committed reference hist files belong to an unrecorded stage
    # (README.md:23) -- matched-config parity lives in
    # runs/matched_golden*; this cross-stage comparison is evidence
    # only and is reported for the temperature_pore stage alone.
    for name in (writers.AXIS_NAMES if args.stage == "temperature_pore"
                 else []):
        ours = read_reference_histogram(
            os.path.join(args.out, f"hist_y_axis_{name}_data.txt"))
        ref = read_reference_histogram(
            os.path.join(args.reference_dir,
                         f"hist_y_axis_{name}_data.txt"))
        m = (ours > 0) | (ref > 0)
        if m.sum() > 2:
            corr = float(np.corrcoef(ours[m], ref[m])[0, 1])
        else:
            corr = float("nan")
        report[f"hist_{name}_corr_vs_reference"] = corr
        denom = max(float(np.abs(ref).sum()), 1e-30)
        report[f"hist_{name}_l1_vs_reference"] = float(
            np.abs(ours - ref).sum() / denom
        )
    from argon_monte_carlo_tpu.io.metrics import device_memory_stats

    mem = device_memory_stats()
    if mem:
        report["device_memory"] = mem
    print(json.dumps(report))
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
