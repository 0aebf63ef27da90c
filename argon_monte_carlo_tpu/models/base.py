"""Shared wall-case application helpers for the workload models."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import measure as measure_ops
from ..ops.walls import WallEvent
from ..state import Measurements, ParticleState


def apply_tracked(
    state: ParticleState,
    measure: Measurements,
    event: WallEvent,
    case_mask: jnp.ndarray,
    num_bins: int,
    hist_hi: float,
    paths_before: jnp.ndarray,
    has_before: jnp.ndarray,
    zero_residual: bool,
):
    """Apply free-path bookkeeping + collision counting for a wall case.

    ``case_mask`` is the raw case predicate (the reference counts every
    particle in the case -- including solver errors -- into the collision
    counter, Open_Air_Pore_MC.py:348), while ``event.mask`` is the subset
    actually handled.

    Returns (state, measure, wall_hits).
    """
    measure = measure_ops.record_completed(
        measure, paths_before, has_before, event.vel_before, event.t,
        event.mask, num_bins, hist_hi,
    )
    state = measure_ops.end_paths(
        state, event.mask, event.t, state.vel, zero_residual
    )
    hits = jnp.sum(case_mask, dtype=jnp.int32)
    return state, measure, hits
