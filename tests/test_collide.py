"""Pair-collision engine: impulse exactness, conservation, broad-phase
equivalence (SURVEY.md C17/C22)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from argon_monte_carlo_tpu.geometry import PoreGeometry
from argon_monte_carlo_tpu.ops import collide
from argon_monte_carlo_tpu.state import Measurements, ParticleState

MASS = 6.63e-26
CR = 3.385137501286538e-10  # 2 * argon radius


def make_state(pos, vel, dtype=jnp.float64):
    pos = jnp.asarray(pos, dtype)
    vel = jnp.asarray(vel, dtype)
    st = ParticleState.zeros(pos.shape[0], dtype)
    st.pos, st.vel = pos, vel
    return st


def resolve(st, partner):
    measure = Measurements.zeros(200, jnp.float64)
    st, measure, ncol, _ = collide.resolve_collisions(
        st, measure, jnp.asarray(partner, jnp.int32), CR, MASS, 200, 1e-6
    )
    return st, measure, ncol


def test_head_on_collision_swaps_velocities():
    """Equal-mass head-on hard spheres exchange velocities exactly."""
    sep = 0.9 * CR
    st = make_state(
        [[0.0, 0.0, 0.0], [sep, 0.0, 0.0]],
        [[100.0, 0.0, 0.0], [-100.0, 0.0, 0.0]],
    )
    st, measure, ncol = resolve(st, [1, 0])
    assert int(ncol) == 1
    v = np.asarray(st.vel)
    np.testing.assert_allclose(v[0], [-100.0, 0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(v[1], [100.0, 0.0, 0.0], atol=1e-9)
    # After rewind+replay the particles are moving apart and separated by
    # at least their rewound contact distance.
    p = np.asarray(st.pos)
    assert p[1, 0] - p[0, 0] >= sep - 1e-15


def test_momentum_and_energy_conserved():
    key = jax.random.PRNGKey(0)
    n = 512
    k1, k2, k3 = jax.random.split(key, 3)
    base = jax.random.uniform(k1, (n // 2, 3), jnp.float64, 0, 1e-7)
    offset = jax.random.normal(k2, (n // 2, 3), jnp.float64)
    offset = offset / jnp.linalg.norm(offset, axis=-1, keepdims=True)
    pos = jnp.concatenate([base, base + offset * 0.8 * CR])
    vel = jax.random.normal(k3, (n, 3), jnp.float64) * 300.0
    st = make_state(pos, vel)
    partner = jnp.concatenate([
        jnp.arange(n // 2, n, dtype=jnp.int32),
        jnp.arange(0, n // 2, dtype=jnp.int32),
    ])
    p0 = np.asarray(jnp.sum(vel, axis=0)) * MASS
    e0 = 0.5 * MASS * float(jnp.sum(vel**2))
    st, measure, ncol = resolve(st, partner)
    assert int(ncol) == n // 2
    p1 = np.asarray(jnp.sum(st.vel, axis=0)) * MASS
    e1 = 0.5 * MASS * float(jnp.sum(st.vel**2))
    np.testing.assert_allclose(p1, p0, rtol=1e-12)
    assert e1 == pytest.approx(e0, rel=1e-12)


def test_non_mutual_not_resolved():
    sep = 0.9 * CR
    st = make_state(
        [[0.0, 0.0, 0.0], [sep, 0.0, 0.0], [2 * sep, 0.0, 0.0]],
        [[100.0, 0.0, 0.0], [0.0, 0.0, 0.0], [-100.0, 0.0, 0.0]],
    )
    # 0 and 2 both want 1; 1 wants 0 (say). Only (0,1) resolves.
    st, measure, ncol = resolve(st, [1, 0, 1])
    assert int(ncol) == 1
    v = np.asarray(st.vel)
    np.testing.assert_allclose(v[2], [-100.0, 0.0, 0.0])  # untouched


def test_allpairs_partner_search():
    sep = 0.5 * CR
    pos = jnp.asarray(
        [[0.0, 0.0, 0.0], [sep, 0.0, 0.0], [1e-8, 1e-8, 1e-8],
         [5e-9, 0.0, 0.0]],
        jnp.float64,
    )
    partner, overflow = collide.allpairs_partner_search(pos, CR, tile=4)
    np.testing.assert_array_equal(np.asarray(partner), [1, 0, -1, -1])
    assert int(overflow) == 0


def _random_gas(key, n, geom):
    """Random particles inside the pore bounding regions."""
    k1, k2, k3 = jax.random.split(key, 3)
    z = jax.random.uniform(k1, (n,), jnp.float64, 0, geom.total_height)
    r_max = jnp.where(
        (z < geom.open_air_height) | (z > geom.cold_top),
        geom.open_air_radius, geom.pore_coated_radius,
    )
    u = jax.random.uniform(k2, (n, 2), jnp.float64)
    theta = u[:, 0] * 2 * np.pi
    r = r_max * jnp.sqrt(u[:, 1])
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), z], -1)


def test_cell_search_matches_allpairs():
    """The compact cell list finds the same partners as exact all-pairs."""
    geom = PoreGeometry()
    key = jax.random.PRNGKey(42)
    n = 4000
    pos = _random_gas(key, n, geom)
    # Large search radius so matches are plentiful at this density.
    radius = 5e-9
    grid = collide.grid_for_pore(geom, cell_size=12e-9, capacity=32)
    dgrid = collide.DeviceGrid.from_grid(grid, jnp.float64)
    p_cells, overflow = jax.jit(
        lambda p: collide.cell_partner_search(p, dgrid, radius)
    )(pos)
    p_exact, _ = jax.jit(
        lambda p: collide.allpairs_partner_search(p, radius, tile=512)
    )(pos)
    assert int(overflow) == 0
    assert int(jnp.sum(p_cells >= 0)) > 50  # plenty of matches found
    np.testing.assert_array_equal(np.asarray(p_cells), np.asarray(p_exact))


def test_cell_search_overflow_counted():
    geom = PoreGeometry()
    # 100 particles crammed into one spot with capacity 8.
    pos = jnp.tile(jnp.asarray([[1e-9, 1e-9, 50e-9]], jnp.float64),
                   (100, 1))
    grid = collide.grid_for_pore(geom, cell_size=12e-9, capacity=8)
    dgrid = collide.DeviceGrid.from_grid(grid, jnp.float64)
    _, overflow = jax.jit(
        lambda p: collide.cell_partner_search(p, dgrid, 1e-9)
    )(pos)
    assert int(overflow) == 100 - 8


def test_grid_covers_domain():
    geom = PoreGeometry()
    grid = collide.grid_for_pore(geom, cell_size=10e-9, capacity=8)
    dgrid = collide.DeviceGrid.from_grid(grid, jnp.float64)
    pos = _random_gas(jax.random.PRNGKey(7), 5000, geom)
    cid = collide.assign_cells(pos, dgrid)
    assert int(jnp.min(cid)) >= 0
    assert int(jnp.max(cid)) < grid.num_cells
    # Neighbour table is self-consistent: cell o=13 (0,0,0 offset) is self.
    np.testing.assert_array_equal(
        grid.neighbors[:, 13], np.arange(grid.num_cells)
    )


def test_f32_packed_index_planes_roundtrip_on_cpu():
    """Regression: index planes were once BITCAST into f32 -- small-int
    bit patterns are denormals and the XLA CPU backend flushes them in
    the fused gather pipeline, so every CPU float32 run silently found
    ~zero collisions (the mutual-match indices came back as garbage).
    Indices now ride value-converted (exact below 2^24).  This f32
    cells-sweep run must find collisions and match its f64 twin's
    count exactly (same trajectories at 10-step horizon)."""
    import dataclasses

    import argon_monte_carlo_tpu as amc

    eng = amc.EngineConfig(dtype="float32", broadphase="cells",
                           steps_per_epoch=5)
    cfg = amc.temperature_pore_config(num_particles_override=4000,
                                      engine=eng)
    _, m32, _ = amc.Simulation(amc.make_workload(cfg)).run(num_steps=10)
    assert int(m32.collision_count) > 0

    eng64 = dataclasses.replace(eng, dtype="float64")
    cfg64 = amc.temperature_pore_config(num_particles_override=4000,
                                        engine=eng64)
    _, m64, _ = amc.Simulation(amc.make_workload(cfg64)).run(num_steps=10)
    # Collision dynamics are chaotic, so after the first f32-rounded
    # event the trajectories (and counts) drift; the guarded regression
    # is a ~40x effect (f32 found 2 collisions where f64 found ~500 on
    # the cube), so a 2x band cleanly separates healthy from broken.
    c32, c64 = int(m32.collision_count), int(m64.collision_count)
    assert c64 > 0 and 0.5 <= c32 / c64 <= 2.0, (c32, c64)
