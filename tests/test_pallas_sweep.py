"""Pallas narrow-phase sweep: interpret-mode equivalence vs the XLA sweep.

Both paths implement the identical lowest-index-overlap partner rule, so
on the same grid + capacity they must return bitwise-identical partner
arrays (SURVEY.md C17; the kernel replaces Open_Air_Pore_MC.py:160-255).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import argon_monte_carlo_tpu as amc
from argon_monte_carlo_tpu.engine import build_grids
from argon_monte_carlo_tpu.ops import collide, pallas_sweep


def make_case(n_particles=4000, seed=0):
    # f32 throughout: the Pallas kernel computes in f32, so bitwise
    # equality with the XLA sweep requires the XLA side to see the same
    # f32 coordinates.
    eng = amc.EngineConfig(dtype="float32", broadphase="cells",
                           use_pallas_sweep="off")
    cfg = amc.temperature_pore_config(
        num_particles_override=n_particles, engine=eng,
    )
    wl = amc.make_workload(cfg)
    # Force the Pallas slot capacity so pslot layouts agree.
    from argon_monte_carlo_tpu.config import cell_size_for

    cell_size = cell_size_for(eng, cfg.physics, cfg.num_molecules,
                              wl.fluid_volume)
    host_grid = collide.grid_for_pore(cfg.geometry, cell_size,
                                      pallas_sweep.CAP)
    dgrid = collide.DeviceGrid.from_grid(host_grid, jnp.float32)
    key = jax.random.PRNGKey(seed)
    state = wl.init_fn(key)
    return cfg, host_grid, dgrid, state


def test_block_plan_verifies():
    _, host_grid, _, _ = make_case()
    plan = pallas_sweep.build_block_plan(host_grid, block_size=64)
    pallas_sweep.verify_block_plan(host_grid, plan)  # raises on any gap
    assert plan.tbl.shape[1] == 16
    # ascending spill-overwrite order
    assert (np.diff(plan.tbl[:, 0]) >= 0).all()


@pytest.mark.parametrize("scale", [1.0, 40.0])
def test_pallas_matches_xla_partner_search(scale):
    """Identical partner arrays under inflated search radii (so a decent
    fraction of particles actually have partners)."""
    cfg, host_grid, dgrid, state = make_case()
    plan = pallas_sweep.plan_for_grid(host_grid)
    sr = cfg.physics.collision_range * scale
    pos = state.pos

    partner_xla, ovf_xla = collide.cell_partner_search(pos, dgrid, sr)

    def table_fn(p):
        cid = collide.assign_cells(p, dgrid)
        return collide.slot_assignment(cid, dgrid)

    partner_pl, ovf_pl = pallas_sweep.pallas_partner_search(
        pos, dgrid, plan, sr, table_fn, interpret=True
    )
    assert int(ovf_xla) == int(ovf_pl)
    px = np.asarray(partner_xla)
    pp = np.asarray(partner_pl)
    n_pairs = (px >= 0).sum()
    if scale > 1:
        assert n_pairs > 50  # the inflated radius must exercise matching
    np.testing.assert_array_equal(px, pp)


def test_pallas_engine_step_matches_xla(tmp_path):
    """Full engine steps with the sweep forced on (interpret mode via
    monkeypatched kernel) equal the XLA-sweep engine bitwise."""
    n, steps = 3000, 5
    eng_x = amc.EngineConfig(dtype="float32", broadphase="cells",
                             steps_per_epoch=steps,
                             use_pallas_sweep="off")
    cfg_x = amc.temperature_pore_config(num_particles_override=n,
                                        engine=eng_x)
    # The XLA engine must run on the same capacity-16 grid.
    import dataclasses

    eng_x16 = dataclasses.replace(eng_x, cell_capacity=pallas_sweep.CAP)
    cfg_x = dataclasses.replace(cfg_x, engine=eng_x16)
    sim_x = amc.Simulation(amc.make_workload(cfg_x))
    st_x, m_x, _ = sim_x.run(num_steps=steps)

    eng_p = dataclasses.replace(eng_x16, use_pallas_sweep="on")
    cfg_p = dataclasses.replace(cfg_x, engine=eng_p)

    import argon_monte_carlo_tpu.ops.pallas_sweep as ps
    orig = ps._sweep_call
    try:
        ps._sweep_call = lambda plan, r2, interpret=False: orig(
            plan, r2, interpret=True
        )
        sim_p = amc.Simulation(amc.make_workload(cfg_p))
        st_p, m_p, _ = sim_p.run(num_steps=steps)
    finally:
        ps._sweep_call = orig

    np.testing.assert_array_equal(np.asarray(st_x.pos), np.asarray(st_p.pos))
    np.testing.assert_array_equal(np.asarray(st_x.vel), np.asarray(st_p.vel))
    assert int(m_x.collision_count) == int(m_p.collision_count)
