"""Mutual-match vs sequential in-cell resolution: the divergence stays
measured in CI (VERDICT r3 "what's missing" #2, per its own
recommendation: keep the measurement, not a parity mode).

The engine resolves a pair iff each side is the other's lowest-index
overlapping candidate; the reference resolves sequentially with
in-loop writeback (Open_Air_Pore_MC.py:221-232).  The two can differ
only for particles overlapping >=2 candidates in the same step, and
the engine defers the unmatched overlap to the next step.  At
reference density those events are rare and the deferrals separate
ballistically -- this pins both facts under a fixed seed.
"""

import os

import numpy as np

import argon_monte_carlo_tpu as amc


def test_deferral_statistics_at_reference_density():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    from argon_monte_carlo_tpu.engine import Simulation, build_grids
    from argon_monte_carlo_tpu.ops import collide

    n, steps = 20_000, 20
    eng = amc.EngineConfig(dtype="float64", broadphase="cells",
                           steps_per_epoch=1)
    cfg = amc.temperature_pore_config(engine=eng).scaled_to(n)
    wl = amc.make_workload(cfg)
    sim = Simulation(wl)
    _, dgrid = build_grids(wl)
    cr = cfg.physics.collision_range

    state, measure, key = sim.init()
    probe = jax.jit(lambda pos: collide.cell_candidate_search(
        pos, dgrid, cr, top_k=2)[0])

    tot = dict(overlap=0, multi=0, deferred=0, persist=0, resolved=0)
    prev_deferred = None
    for s in range(steps):
        cands = np.asarray(probe(state.pos))
        partner = cands[:, 0]
        overlap = partner >= 0
        multi = cands[:, 1] >= 0
        mutual = overlap & (partner[np.clip(partner, 0, None)] ==
                            np.arange(len(partner)))
        deferred = overlap & ~mutual
        if prev_deferred is not None:
            tot["persist"] += int((prev_deferred & deferred).sum())
        tot["overlap"] += int(overlap.sum())
        tot["multi"] += int(multi.sum())
        tot["deferred"] += int(deferred.sum())
        tot["resolved"] += int(mutual.sum()) // 2
        prev_deferred = deferred
        state, measure, _ = sim.run(num_steps=1, state=state,
                                    measure=measure, run_key=key,
                                    start_step=s)

    # Collisions actually happened, so the comparison is non-vacuous.
    assert tot["resolved"] > 10
    # The only divergence-capable events (>=2 overlapping candidates)
    # are a rare fraction of overlapping particles...
    assert tot["multi"] <= 0.05 * tot["overlap"]
    # ...and no deferred overlap persisted to the next step under this
    # seed: every unmatched overlap separated ballistically, i.e. zero
    # resolutions were lost or delayed vs the reference's sequential
    # same-sweep handling (scripts/quantify_matching.py measured the
    # same at 60k/60 steps: ~480 resolutions, 0 persisting deferrals).
    assert tot["persist"] == 0
