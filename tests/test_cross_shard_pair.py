"""A colliding pair that straddles a slab boundary must resolve
consistently on both shards via the ppermute halo (no result exchange:
both sides deterministically reach the same match -- ARCHITECTURE.md)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import argon_monte_carlo_tpu as amc
from argon_monte_carlo_tpu.config import EngineConfig
from argon_monte_carlo_tpu.parallel.mesh import make_mesh
from argon_monte_carlo_tpu.parallel.shard import ShardedSimulation
from argon_monte_carlo_tpu.state import ParticleState

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device mesh"
)


def test_boundary_pair_resolved_once():
    cfg = amc.temperature_pore_config(
        num_particles_override=202,
        engine=EngineConfig(dtype="float64", broadphase="cells",
                            steps_per_epoch=1),
    )
    wl = amc.make_workload(cfg)
    sim = ShardedSimulation(wl, mesh=make_mesh(2))
    z_cut = float(sim.plan.slab_z[1])
    geom = cfg.geometry
    assert geom.open_air_height < z_cut < geom.cold_top  # inside the pore
    cr = cfg.physics.collision_range

    def init_fn(key):
        n = cfg.num_molecules
        st = ParticleState.zeros(n, jnp.float64)
        # Background far from the cut, spread through the open-air caps.
        ang = jnp.linspace(0.0, 2 * np.pi, n, endpoint=False)
        r = 0.5 * geom.open_air_radius
        z_bg = jnp.where(jnp.arange(n) % 2 == 0,
                         0.5 * geom.open_air_height,
                         geom.total_height - 0.5 * geom.open_air_height)
        pos = jnp.stack([r * jnp.cos(ang), r * jnp.sin(ang), z_bg], -1)
        # The straddling pair: overlapping, head-on along z, on the axis.
        pos = pos.at[0].set(jnp.array([0.0, 0.0, z_cut - 0.3 * cr]))
        pos = pos.at[1].set(jnp.array([0.0, 0.0, z_cut + 0.3 * cr]))
        vel = jnp.zeros((n, 3), jnp.float64)
        vel = vel.at[0].set(jnp.array([0.0, 0.0, 100.0]))
        vel = vel.at[1].set(jnp.array([0.0, 0.0, -100.0]))
        st.pos, st.vel = pos, vel
        return st

    sim.workload = dataclasses.replace(wl, init_fn=init_fn)
    state, measure, metrics = sim.run(num_steps=1)
    st, valid, gid = state
    total = sim.finalize_measure(measure)

    # Exactly one pair collision, counted once globally.
    assert int(metrics.collisions[0]) == 1
    assert int(total.collision_count) == 1

    # Head-on equal-mass hard spheres exchange velocities: both particles
    # (whichever shard owns them) now move apart along z.
    v = np.asarray(st.vel)
    g = np.asarray(gid)
    ok = np.asarray(valid)
    vz0 = v[ok & (g == 0)][:, 2]
    vz1 = v[ok & (g == 1)][:, 2]
    assert vz0.shape == (1,) and vz1.shape == (1,)
    assert vz0[0] == pytest.approx(-100.0, rel=1e-9)
    assert vz1[0] == pytest.approx(100.0, rel=1e-9)
    # Momentum conserved and nobody lost.
    assert int(jnp.sum(valid)) == cfg.num_molecules
