"""Multi-device z-slab engine on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import argon_monte_carlo_tpu as amc
from argon_monte_carlo_tpu.config import EngineConfig
from argon_monte_carlo_tpu.parallel.mesh import make_mesh
from argon_monte_carlo_tpu.parallel.shard import ShardedSimulation

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs the virtual multi-device mesh"
)


def make_sharded(n_devices=4, n_particles=4000, energized=True,
                 dtype="float64", debug_audits=False):
    eng = EngineConfig(dtype=dtype, broadphase="cells",
                       steps_per_epoch=5, debug_audits=debug_audits)
    cfg = amc.temperature_pore_config(
        num_particles_override=n_particles, engine=eng,
    ) if energized else amc.PoreConfig(
        num_particles_override=n_particles, engine=eng,
    )
    wl = amc.make_workload(cfg)
    return cfg, ShardedSimulation(wl, mesh=make_mesh(n_devices))


def test_particle_count_preserved():
    """Halo exchange + migration never lose or duplicate particles."""
    cfg, sim = make_sharded(n_devices=4, n_particles=4000)
    state, measure, metrics = sim.run(num_steps=10)
    st, valid, gid = state
    assert int(jnp.sum(valid)) == cfg.num_molecules
    # Global ids of live particles form exactly {0..N-1}.
    gids = np.sort(np.asarray(gid)[np.asarray(valid)])
    np.testing.assert_array_equal(gids, np.arange(cfg.num_molecules))
    m = sim.finalize_measure(measure)
    assert int(m.overflow_count) == 0


def test_specular_pore_conserves_energy_sharded():
    """Closed specular system: total KE is invariant under the sharded
    engine (walls, pair collisions, halo, migration all preserve it)."""
    cfg, sim = make_sharded(n_devices=4, n_particles=3000, energized=False)
    (st0, valid0, gid0), measure, key = sim.init()
    e0 = float(jnp.sum(jnp.where(valid0[:, None], st0.vel, 0.0) ** 2))
    state, measure, metrics = sim.run(
        num_steps=10, state=(st0, valid0, gid0), measure=measure,
        run_key=key,
    )
    st, valid, gid = state
    e1 = float(jnp.sum(jnp.where(valid[:, None], st.vel, 0.0) ** 2))
    assert e1 == pytest.approx(e0, rel=1e-9)


def test_momentum_ledger_replicated_and_finite():
    cfg, sim = make_sharded(n_devices=4, n_particles=4000)
    state, measure, metrics = sim.run(num_steps=10)
    assert np.isfinite(np.asarray(metrics.momentum_z)).all()
    assert metrics.momentum_z.shape == (10,)


def test_sharded_matches_single_chip_statistics():
    """Same workload, sharded vs single chip: collision totals and ledger
    magnitudes agree statistically (not bitwise: different RNG lanes)."""
    n, steps = 6000, 15
    cfg = amc.temperature_pore_config(
        num_particles_override=n,
        engine=EngineConfig(dtype="float64", broadphase="cells",
                            steps_per_epoch=5),
    )
    wl = amc.make_workload(cfg)
    single = amc.Simulation(wl)
    _, m1, met1 = single.run(num_steps=steps)
    sharded = ShardedSimulation(wl, mesh=make_mesh(4))
    _, m2s, met2 = sharded.run(num_steps=steps)
    m2 = sharded.finalize_measure(m2s)
    c1, c2 = int(m1.collision_count), int(m2.collision_count)
    # Wall-hit dominated counts; Poisson-ish, expect agreement within
    # ~5 sigma of sqrt(counts).
    assert abs(c1 - c2) <= 5 * max(np.sqrt(max(c1, c2)), 3.0)
    e1 = float(met1.energy_cold.sum())
    e2 = float(met2.energy_cold.sum())
    assert np.sign(e1) == np.sign(e2)
    assert 0.3 < abs(e1) / max(abs(e2), 1e-30) < 3.0


def test_sharded_missed_case_audit_detects_seeded_miss():
    """The audit predicate fires on a deliberately-missed wall crossing
    (reference audit, Open_Air_Pore_MC.py:488-511), and the sharded step
    surfaces audit counts when debug_audits is on (VERDICT r1 #9)."""
    import jax.numpy as jnp

    from argon_monte_carlo_tpu.state import ParticleState

    cfg, sim = make_sharded(n_devices=4, n_particles=2000)
    wl = sim.workload
    geom = cfg.geometry

    # Seed a case-6 miss directly: prior inside the coated pore radius,
    # current outside, mid-cold-segment z -- as if the handler skipped it.
    r_in = geom.pore_coated_radius * 0.5
    r_out = geom.pore_coated_radius * 1.5
    z_mid = (geom.gap_top + geom.cold_top) / 2.0
    st = ParticleState.zeros(4, jnp.float64)
    st.pos = jnp.array([[r_out, 0.0, z_mid]] * 4)
    prior = jnp.array([[r_in, 0.0, z_mid]] * 4)
    missed = wl.audit_fn(st, prior)
    assert int(missed.sum()) >= 4, missed

    # And the sharded engine reports the channel when enabled.
    cfg2, sim2 = make_sharded(n_devices=4, n_particles=2000,
                              debug_audits=True)
    _, _, metrics = sim2.run(num_steps=3)
    assert metrics.missed_cases.shape == (3, 10)
    # Residuals are rare compound-crossing stragglers (a particle that
    # crossed a second boundary within the same dt after reflection);
    # the reference's audit occasionally prints the same.  Require they
    # stay at the stray level, not systematic.
    assert int(np.asarray(metrics.missed_cases).sum()) <= 5


# ---------------------------------------------------------------------------
# Sharded Verlet reach-pair narrow phase (VERDICT r2 item 3)
# ---------------------------------------------------------------------------


def make_sharded_pairs(n_devices=4, n_particles=3000, energized=True,
                       k=4, steps_per_epoch=4):
    eng = EngineConfig(dtype="float64", broadphase="cells",
                       steps_per_epoch=steps_per_epoch,
                       narrowphase="pairs", rebuild_interval=k)
    cfg = amc.temperature_pore_config(
        num_particles_override=n_particles, engine=eng,
    ) if energized else amc.PoreConfig(
        num_particles_override=n_particles, engine=eng,
    )
    wl = amc.make_workload(cfg)
    return cfg, ShardedSimulation(wl, mesh=make_mesh(n_devices))


def _gather_by_gid(state, n):
    st, valid, gid = state
    v = np.asarray(valid)
    g = np.asarray(gid)[v]
    pos = np.asarray(st.pos)[v]
    vel = np.asarray(st.vel)[v]
    order = np.argsort(g)
    assert (g[order] == np.arange(n)).all()
    return pos[order], vel[order]


def test_sharded_pairs_matches_sharded_sweep_bitwise_specular():
    """Specular pore (RNG-free after init): the sharded pairs engine
    must reproduce the sharded sweep engine's trajectories bitwise --
    the pair list is a superset of every collision pair between
    rebuilds, ghost mirrors are refreshed per step from the owner, and
    the resolve arithmetic is the identical IEEE expression."""
    n, steps = 3000, 12
    cfg_s, sim_s = make_sharded(n_devices=4, n_particles=n,
                                energized=False)
    # (sweep epochs are 5 steps; the pairs run below uses spe=4 == K so
    # only one block length compiles -- same physics either way.)
    state_s, m_s, _ = sim_s.run(num_steps=steps)
    cfg_p, sim_p = make_sharded_pairs(n_devices=4, n_particles=n,
                                      energized=False)
    state_p, m_p, _ = sim_p.run(num_steps=steps)

    pos_s, vel_s = _gather_by_gid(state_s, n)
    pos_p, vel_p = _gather_by_gid(state_p, n)
    np.testing.assert_array_equal(pos_s, pos_p)
    np.testing.assert_array_equal(vel_s, vel_p)
    tot_s = sim_s.finalize_measure(m_s)
    tot_p = sim_p.finalize_measure(m_p)
    assert int(tot_s.collision_count) == int(tot_p.collision_count)
    assert int(tot_p.overflow_count) == 0


def test_sharded_pairs_energized_statistics_and_conservation():
    """Energized pore, sharded pairs vs single-chip pairs: particle
    count exactly preserved, no capacity overflows, collision totals
    statistically equal (RNG lanes differ), ledger magnitudes agree."""
    import dataclasses as dc

    n, steps = 6000, 15
    cfg, sim = make_sharded_pairs(n_devices=4, n_particles=n,
                                  energized=True, k=5, steps_per_epoch=5)
    state, measure, metrics = sim.run(num_steps=steps)
    st, valid, gid = state
    assert int(jnp.sum(valid)) == n
    gids = np.sort(np.asarray(gid)[np.asarray(valid)])
    np.testing.assert_array_equal(gids, np.arange(n))
    tot = sim.finalize_measure(measure)
    assert int(tot.overflow_count) == 0
    assert int(tot.err_count) == 0

    eng1 = EngineConfig(dtype="float64", broadphase="cells",
                        steps_per_epoch=5, narrowphase="pairs",
                        rebuild_interval=5)
    cfg1 = amc.temperature_pore_config(num_particles_override=n,
                                       engine=eng1)
    single = amc.Simulation(amc.make_workload(cfg1))
    _, m1, met1 = single.run(num_steps=steps)
    c1, c2 = int(m1.collision_count), int(tot.collision_count)
    assert abs(c1 - c2) <= 5 * max(np.sqrt(max(c1, c2)), 3.0)
    e1 = float(met1.energy_cold.sum())
    e2 = float(metrics.energy_cold.sum())
    assert np.sign(e1) == np.sign(e2)


def test_sharded_capacity_overflow_counters_fire():
    """Deliberately starve the halo/migration buffers: the engine must
    COUNT every dropped lane (halo_trunc_count / overflow_count), never
    lose them silently (VERDICT r2 item 8)."""
    import dataclasses as dc

    cfg, sim = make_sharded(n_devices=4, n_particles=4000,
                            energized=True)
    sim.plan = dc.replace(sim.plan, halo_capacity=2,
                          migration_capacity=1)
    sim._build_epoch_fn()
    # ~0.2 expected crossings per step and face: 40 steps make a
    # same-step double crossing (the capacity-1 overflow) near-certain.
    state, measure, metrics = sim.run(num_steps=40)
    tot = sim.finalize_measure(measure)
    st, valid, gid = state
    alive = int(jnp.sum(valid))
    # Migration drops lose real particles -- and each loss is counted.
    assert int(tot.halo_trunc_count) > 0
    assert int(tot.overflow_count) > 0
    assert alive + int(tot.overflow_count) >= cfg.num_molecules


def test_sharded_rejects_hist_flush_interval():
    """hist_flush_interval is a single-chip bandwidth knob; the sharded
    step always runs the exact dense per-step flush.  The constructor
    must refuse the knob rather than silently ignore it."""
    import pytest

    eng = EngineConfig(dtype="float64", broadphase="cells",
                       hist_flush_interval=8)
    cfg = amc.temperature_pore_config(num_particles_override=1000,
                                      engine=eng)
    with pytest.raises(ValueError, match="hist_flush_interval"):
        ShardedSimulation(amc.make_workload(cfg), mesh=make_mesh(2))


def test_sharded_pairs_levers_match_sharded_sweep_bitwise():
    """The three r4 rebuild levers (packed-layer assign, widened-
    superset bf16 hit test, one-pass tournament emission) must hold
    the sharded-pairs == sharded-sweep bitwise contract too -- the
    sharded rebuild routes through the same cell_candidate_search with
    a cell window, and a round-5 default flip must not be single-chip
    only."""
    import dataclasses

    n, steps = 3000, 12
    cfg_s, sim_s = make_sharded(n_devices=4, n_particles=n,
                                energized=False)
    state_s, m_s, _ = sim_s.run(num_steps=steps)

    eng = EngineConfig(dtype="float64", broadphase="cells",
                       steps_per_epoch=4, narrowphase="pairs",
                       rebuild_interval=4,
                       packed_layer_gather=True,
                       rebuild_bf16_hittest=True)
    cfg_p = amc.PoreConfig(num_particles_override=n, engine=eng)
    sim_p = ShardedSimulation(amc.make_workload(cfg_p),
                              mesh=make_mesh(4))
    assert sim_p.device_grid.layer_packed is not None
    state_p, m_p, _ = sim_p.run(num_steps=steps)

    pos_s, vel_s = _gather_by_gid(state_s, n)
    pos_p, vel_p = _gather_by_gid(state_p, n)
    np.testing.assert_array_equal(pos_s, pos_p)
    np.testing.assert_array_equal(vel_s, vel_p)
    tot_s = sim_s.finalize_measure(m_s)
    tot_p = sim_p.finalize_measure(m_p)
    assert int(tot_s.collision_count) == int(tot_p.collision_count)
