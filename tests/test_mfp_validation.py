"""Mean-free-path physics validation (the reference's primary check).

The cube stage exists "to establish mean free path validity"
(reference README.md:10-12): measured MFP must approach the analytic
lambda = kT/(sqrt(2) sigma P) and free paths must be exponential.

At the true argon cross-section, lambda/collision_range ~ 234 and the
CPU-affordable particle counts would take hours to accumulate paths, so
this test boosts sigma by 4x (lambda' ~ 19.9nm, still >> collision
range' ~ 0.68nm and >> the per-step displacement) in a 40nm box at
ambient density, with a timestep fine enough that pairs cannot tunnel
through each other.  This is a physics-level golden test: it validates
the entire drift + wall + detection + impulse + path-measurement chain
against kinetic theory, exactly the way the reference validates itself.
"""

import dataclasses
import math

import jax.numpy as jnp
import numpy as np
import pytest

import argon_monte_carlo_tpu as amc
from argon_monte_carlo_tpu.geometry import CubeGeometry
from argon_monte_carlo_tpu.physics import GasPhysics


def test_measured_mfp_matches_analytic():
    physics = GasPhysics(sigma=3.6e-19 * 4.0)
    lam = physics.lambda_mfp  # ~19.93nm
    geom = CubeGeometry(lx=40e-9, ly=40e-9, lz=40e-9)
    n = physics.num_molecules(geom.volume)
    assert 1200 < n < 2000

    # dt: ~0.2nm displacement per step; run 20 mean free times.
    v = physics.v_mean
    dt_target = 0.2e-9 / v
    steps_per_mft = max(1, int(round(physics.tau / dt_target)))
    cfg = amc.CubeConfig(
        geometry=geom,
        physics=physics,
        nmft=20,
        steps_per_mft=steps_per_mft,
        engine=amc.EngineConfig(broadphase="allpairs", dtype="float64",
                                steps_per_epoch=200, allpairs_tile=512),
    )
    sim = amc.Simulation(amc.make_workload(cfg))
    state, measure, metrics = sim.run()

    count = int(measure.path_count)
    assert count > 3000, f"too few completed paths: {count}"
    measured = float(measure.path_sum[0]) / count
    # Discrete-time detection slightly under-detects grazing collisions,
    # lengthening the measured MFP; 20% covers that bias + statistics.
    assert measured == pytest.approx(lam, rel=0.20), (measured, lam)

    # Free paths are exponential: compare histogram decay over the first
    # decade against exp(-x/lambda).
    hist = np.asarray(measure.hist[0][:200])
    width = 1e-6 / 200  # 5nm bins; lambda ~ 4 bins
    x = (np.arange(200) + 0.5) * width
    m = hist > 5
    assert m.sum() > 4
    # Log-linear fit of the counts.
    coef = np.polyfit(x[m], np.log(hist[m]), 1)
    fitted_lambda = -1.0 / coef[0]
    assert fitted_lambda == pytest.approx(lam, rel=0.35)


def test_energy_conserved_through_full_run():
    """The whole cube run conserves kinetic energy exactly (specular walls
    + elastic collisions only)."""
    physics = GasPhysics(sigma=3.6e-19 * 4.0)
    geom = CubeGeometry(lx=40e-9, ly=40e-9, lz=40e-9)
    cfg = amc.CubeConfig(
        geometry=geom, physics=physics, nmft=2, steps_per_mft=50,
        engine=amc.EngineConfig(broadphase="allpairs", dtype="float64",
                                steps_per_epoch=100, allpairs_tile=512),
    )
    sim = amc.Simulation(amc.make_workload(cfg))
    state0, measure, key = sim.init()
    e0 = float(jnp.sum(state0.vel ** 2))
    state, measure, _ = sim.run(num_steps=100, state=state0,
                                measure=measure, run_key=key)
    e1 = float(jnp.sum(state.vel ** 2))
    assert e1 == pytest.approx(e0, rel=1e-11)
