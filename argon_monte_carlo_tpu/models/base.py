"""Shared wall-case application helpers for the workload models."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import measure as measure_ops
from ..ops.walls import WallEvent
from ..state import Measurements, ParticleState


def pore_missed_case_audit(state, prior, geom, physics, energized: bool):
    """Re-evaluate each wall-case predicate after handling; residual
    counts mean a case was missed (reference audit prints,
    Open_Air_Pore_MC.py:488-511; Temperature_Pore_MC.py:760-802).

    Returns (10,) int32: [case1, 2a, 2b, 3a, 3b, 4, 5a, 5b, 6a, 6b].
    """
    ar = physics.argon_radius
    h = geom.total_height
    oah = geom.open_air_height
    gap_lo, gap_hi = geom.gap_bottom, geom.gap_top
    cr_gap = geom.gap_collision_radius(physics)
    cr_pore = geom.pore_collision_radius(physics)
    x, y, z = state.pos[:, 0], state.pos[:, 1], state.pos[:, 2]
    px, py, pz = prior[:, 0], prior[:, 1], prior[:, 2]
    r2 = x * x + y * y
    pr2 = px * px + py * py
    if energized:  # insets as in Temperature_Pore_MC.py predicates
        c3a = (pz >= h - oah + ar) & (z < h - oah + ar) & (
            r2 > geom.pore_coated_radius**2)
        c3b = (pz <= oah - ar) & (z > oah - ar) & (
            r2 > geom.pore_coated_radius**2)
        c4 = ((pz < gap_hi - ar) & (pz > gap_lo + ar)
              & (pr2 <= cr_gap**2) & (r2 > cr_gap**2))
        in_gap = (pz <= gap_hi - ar) & (pz >= gap_lo + ar)
        c5a = (pr2 >= cr_pore**2) & (z < gap_lo + ar) & in_gap
        c5b = (pr2 >= cr_pore**2) & (z > gap_hi - ar) & in_gap
        crossed = (pr2 <= cr_pore**2) & (r2 > cr_pore**2)
        c6a = crossed & (z <= gap_lo + ar) & (z >= oah - ar)
        c6b = crossed & (z < h - oah + ar) & (z > gap_hi - ar)
    else:  # pore v1 predicates (Open_Air_Pore_MC.py:488-511)
        r = jnp.sqrt(r2)
        pr = jnp.sqrt(pr2)
        c3a = (pz > h - oah) & (z < h - oah) & (r > geom.pore_coated_radius)
        c3b = (pz < oah) & (z > oah) & (r > geom.pore_coated_radius)
        c4 = ((pz < gap_hi) & (pz > gap_lo)
              & (pr < geom.gap_radius) & (r > geom.gap_radius))
        in_gap = (pz < gap_hi) & (pz > gap_lo)
        c5a = (pr > geom.pore_coated_radius) & (z < gap_lo) & in_gap
        c5b = (pr > geom.pore_coated_radius) & (z > gap_hi) & in_gap
        crossed = (pr < geom.pore_coated_radius) & (
            r > geom.pore_coated_radius)
        c6a = crossed & (z < h - oah) & (z > gap_hi)
        c6b = crossed & (z < gap_lo) & (z > oah)
    cases = [
        r2 > geom.open_air_radius**2,   # case 1
        z < 0.0,                        # case 2a
        z > h,                          # case 2b
        c3a, c3b, c4, c5a, c5b, c6a, c6b,
    ]
    return jnp.stack([jnp.sum(c, dtype=jnp.int32) for c in cases])


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
