"""Unit tests for the wall-collision primitives (SURVEY.md C11-C15)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from argon_monte_carlo_tpu.ops import walls as wall_ops
from argon_monte_carlo_tpu.state import ParticleState


def make_state(pos, vel):
    pos = jnp.asarray(pos, jnp.float64)
    vel = jnp.asarray(vel, jnp.float64)
    st = ParticleState.zeros(pos.shape[0], jnp.float64)
    st.pos, st.vel = pos, vel
    return st


def test_specular_plane_backtrace():
    # Particle overshot z=1 by 0.2 with vz=2 -> t=0.1; lands at 1-0.2=0.8.
    st = make_state([[0.0, 0.0, 1.2]], [[3.0, 4.0, 2.0]])
    ev = wall_ops.specular_plane(st, jnp.array([True]), 2, 1.0)
    np.testing.assert_allclose(np.asarray(ev.state.pos[0]),
                               [0.0, 0.0, 0.8], atol=1e-12)
    np.testing.assert_allclose(np.asarray(ev.state.vel[0]),
                               [3.0, 4.0, -2.0], atol=1e-12)
    assert float(ev.t[0]) == pytest.approx(0.1)


def test_specular_plane_mask_untouched():
    st = make_state([[0.0, 0.0, 1.2]], [[3.0, 4.0, 2.0]])
    ev = wall_ops.specular_plane(st, jnp.array([False]), 2, 1.0)
    np.testing.assert_allclose(np.asarray(ev.state.pos[0]),
                               [0.0, 0.0, 1.2])
    np.testing.assert_allclose(np.asarray(ev.state.vel[0]),
                               [3.0, 4.0, 2.0])


def test_specular_cylinder_radial_hit():
    # Moving straight out along +x; crossed R=1 to x=1.3 with vx=1.
    # Backtrace t=0.3, reflect -> vx=-1, replay -> x=0.7.
    st = make_state([[1.3, 0.0, 5.0]], [[1.0, 0.0, 2.0]])
    ev = wall_ops.specular_cylinder(st, jnp.array([True]), 1.0)
    np.testing.assert_allclose(np.asarray(ev.state.pos[0]),
                               [0.7, 0.0, 5.0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(ev.state.vel[0]),
                               [-1.0, 0.0, 2.0], atol=1e-12)
    assert not bool(ev.err_mask[0])


def test_specular_cylinder_preserves_speed_random():
    import jax

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    n = 1000
    # Points outside the unit circle moving outward.
    theta = jax.random.uniform(k1, (n,), jnp.float64, 0, 2 * math.pi)
    r = 1.0 + jax.random.uniform(k2, (n,), jnp.float64, 0.001, 0.05)
    pos = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta),
                     jnp.zeros(n)], -1)
    vel = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True) * 3.0
    vel = vel.at[:, 2].set(1.0)
    st = make_state(pos, vel)
    speed0 = np.asarray(jnp.linalg.norm(vel, axis=-1))
    ev = wall_ops.specular_cylinder(st, jnp.ones(n, bool), 1.0)
    speed1 = np.asarray(jnp.linalg.norm(ev.state.vel, axis=-1))
    np.testing.assert_allclose(speed1, speed0, rtol=1e-10)
    r_after = np.asarray(jnp.linalg.norm(ev.state.pos[:, :2], axis=-1))
    assert (r_after <= 1.0 + 1e-9).all()


def test_specular_cylinder_degenerate_counts_err():
    # Tangential velocity, backward ray never crosses the inset circle.
    st = make_state([[1.2, 0.0, 0.0]], [[0.0, 1.0, 0.0]])
    ev = wall_ops.specular_cylinder(st, jnp.array([True]), 1.0)
    assert bool(ev.err_mask[0])
    np.testing.assert_allclose(np.asarray(ev.state.pos[0]), [1.2, 0, 0])


def test_energized_plane_energy_exchange():
    mass = 6.63e-26
    e_surf = 3.2454e-21
    alpha = 0.95
    vz = -400.0
    st = make_state([[0.0, 0.0, -0.01e-9]], [[100.0, 50.0, vz]])
    uniforms = jnp.asarray([[0.5, 0.25]], jnp.float64)
    cos_cone = wall_ops.cos_cone_from_deg(85.0)
    from argon_monte_carlo_tpu import rng
    trig = rng.cone_trig(uniforms, cos_cone)
    ev = wall_ops.energized_plane(
        st, jnp.array([True]), 0.0, 1.0, e_surf, alpha, mass, trig,
    )
    v0 = np.array([100.0, 50.0, vz])
    e0 = 0.5 * mass * (v0 @ v0)
    e1 = e0 + (e_surf - e0) * alpha
    v1 = np.asarray(ev.state.vel[0])
    # New kinetic energy matches the accommodation rule exactly
    # (Temperature_Pore_MC.py:377-385).
    assert 0.5 * mass * (v1 @ v1) == pytest.approx(e1, rel=1e-12)
    # Ledger: energy transfer and z momentum change.
    assert float(ev.energy) == pytest.approx(e1 - e0, rel=1e-12)
    assert float(ev.momentum_z) == pytest.approx(
        mass * (v1[2] - vz), rel=1e-12
    )
    # Placed exactly at the wall; re-emitted inward (vz > 0 here).
    assert float(ev.state.pos[0, 2]) == pytest.approx(0.0, abs=1e-18)
    assert v1[2] > 0


def test_energized_cylinder_inward():
    mass = 6.63e-26
    st = make_state([[1.01e-8, 0.0, 5e-8]], [[300.0, 0.0, -100.0]])
    uniforms = jnp.asarray([[0.3, 0.8]], jnp.float64)
    cos_cone = wall_ops.cos_cone_from_deg(85.0)
    from argon_monte_carlo_tpu import rng
    trig = rng.cone_trig(uniforms, cos_cone)
    ev = wall_ops.energized_cylinder(
        st, jnp.array([True]), 1e-8, 2e-21, 0.8, mass, trig,
    )
    assert not bool(ev.err_mask[0])
    p = np.asarray(ev.state.pos[0])
    # Placed on the cylinder surface.
    assert math.hypot(p[0], p[1]) == pytest.approx(1e-8, rel=1e-9)
    # Velocity points inward: v . r_hat < 0.
    v = np.asarray(ev.state.vel[0])
    assert v[0] * p[0] + v[1] * p[1] < 0
