"""Checkpoint / exact resume.

The reference has none: a 20,000-step run that dies loses everything
(SURVEY.md section 5).  Here the full simulation state -- particles, path
accumulators, measurement accumulators, RNG key, and step index -- round-
trips through a single ``.npz`` file, giving bit-exact resume (the step
function derives its per-step key by folding the step index into the run
key, so resuming at step k reproduces the uninterrupted run).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..state import Measurements, ParticleState


def save_checkpoint(path: str, state: ParticleState, measure: Measurements,
                    run_key, step: int) -> str:
    np.savez_compressed(
        path,
        pos=np.asarray(state.pos),
        vel=np.asarray(state.vel),
        paths=np.asarray(state.paths),
        has_collided=np.asarray(state.has_collided),
        hist=np.asarray(measure.hist),
        path_sum=np.asarray(measure.path_sum),
        path_count=np.asarray(measure.path_count),
        collision_count=np.asarray(measure.collision_count),
        err_count=np.asarray(measure.err_count),
        overflow_count=np.asarray(measure.overflow_count),
        halo_trunc_count=np.asarray(measure.halo_trunc_count),
        hist_drop_count=np.asarray(measure.hist_drop_count),
        hot_spill_count=np.asarray(measure.hot_spill_count),
        run_key=np.asarray(run_key),
        step=np.asarray(step),
    )
    return path


def load_checkpoint(path: str):
    """Returns (state, measure, run_key, step)."""
    with np.load(path) as z:
        state = ParticleState(
            pos=jnp.asarray(z["pos"]),
            vel=jnp.asarray(z["vel"]),
            paths=jnp.asarray(z["paths"]),
            has_collided=jnp.asarray(z["has_collided"]),
        )
        n = z["pos"].shape[0]
        dtype = z["paths"].dtype
        measure = Measurements(
            hist=jnp.asarray(z["hist"]),
            path_sum=jnp.asarray(z["path_sum"]),
            path_count=jnp.asarray(z["path_count"]),
            collision_count=jnp.asarray(z["collision_count"]),
            err_count=jnp.asarray(z["err_count"]),
            overflow_count=jnp.asarray(z["overflow_count"]),
            # Absent in pre-r2 checkpoints.
            halo_trunc_count=jnp.asarray(
                z["halo_trunc_count"] if "halo_trunc_count" in z.files
                else np.zeros((), np.int32)
            ),
            # Absent in pre-r2 checkpoints.
            hist_drop_count=jnp.asarray(
                z["hist_drop_count"] if "hist_drop_count" in z.files
                else np.zeros((), np.int32)
            ),
            # Absent in pre-r3 checkpoints.
            hot_spill_count=jnp.asarray(
                z["hot_spill_count"] if "hot_spill_count" in z.files
                else np.zeros((), np.int32)
            ),
            # Step-transient staging; always empty at epoch boundaries.
            pending_vals=jnp.zeros((n, 4), dtype),
            pending_mask=jnp.zeros((n,), jnp.bool_),
        )
        run_key = jnp.asarray(z["run_key"])
        step = int(z["step"])
    return state, measure, run_key, step


def save_sharded_checkpoint(path: str, state_tuple, measure, run_key,
                            step: int) -> str:
    """Checkpoint the z-slab engine: (state, valid, gid) + per-shard
    accumulators.  Arrays are pulled to host in their flat sharded
    layout; resume requires the same mesh shape."""
    state, valid, gid = state_tuple
    extra = {
        "valid": np.asarray(valid),
        "gid": np.asarray(gid),
        "sharded": np.asarray(True),
    }
    measure_arrays = {
        f"m_{k}": np.asarray(v) for k, v in vars(measure).items()
    }
    np.savez_compressed(
        path,
        pos=np.asarray(state.pos),
        vel=np.asarray(state.vel),
        paths=np.asarray(state.paths),
        has_collided=np.asarray(state.has_collided),
        run_key=np.asarray(run_key),
        step=np.asarray(step),
        **extra,
        **measure_arrays,
    )
    return path


def load_sharded_checkpoint(path: str):
    """Returns ((state, valid, gid), measure, run_key, step)."""
    with np.load(path) as z:
        state = ParticleState(
            pos=jnp.asarray(z["pos"]),
            vel=jnp.asarray(z["vel"]),
            paths=jnp.asarray(z["paths"]),
            has_collided=jnp.asarray(z["has_collided"]),
        )
        valid = jnp.asarray(z["valid"])
        gid = jnp.asarray(z["gid"])
        measure = Measurements(
            **{k[2:]: jnp.asarray(z[k]) for k in z.files
               if k.startswith("m_")}
        )
        run_key = jnp.asarray(z["run_key"])
        step = int(z["step"])
    return (state, valid, gid), measure, run_key, step
