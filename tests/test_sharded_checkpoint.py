"""Sharded-engine checkpoint/resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import argon_monte_carlo_tpu as amc
from argon_monte_carlo_tpu.config import EngineConfig
from argon_monte_carlo_tpu.io import checkpoint as ckpt_io
from argon_monte_carlo_tpu.parallel.mesh import make_mesh
from argon_monte_carlo_tpu.parallel.shard import ShardedSimulation

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs the virtual multi-device mesh"
)


def test_sharded_checkpoint_roundtrip(tmp_path):
    cfg = amc.temperature_pore_config(
        num_particles_override=3000,
        engine=EngineConfig(dtype="float64", broadphase="cells",
                            steps_per_epoch=5),
    )
    sim = ShardedSimulation(amc.make_workload(cfg), mesh=make_mesh(4))
    state, measure, key = sim.init()
    state, measure, _ = sim.run(num_steps=5, state=state, measure=measure,
                                run_key=key)
    path = str(tmp_path / "shck.npz")
    ckpt_io.save_sharded_checkpoint(path, state, measure, key, 5)
    state2, measure2, key2, step = ckpt_io.load_sharded_checkpoint(path)
    assert step == 5
    st, valid, gid = state
    st2, valid2, gid2 = state2
    np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(st2.pos))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid2))

    # Resumed run continues and conserves particles.
    state3, measure3, _ = sim.run(num_steps=5, state=state2,
                                  measure=measure2, run_key=key2,
                                  start_step=step)
    st3, valid3, _ = state3
    assert int(jnp.sum(valid3)) == cfg.num_molecules
