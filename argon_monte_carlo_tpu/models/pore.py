"""Stage 2 workload: specular thruster pore (reference Open_Air_Pore_MC.py).

All six wall cases are specular, but -- unlike the cube -- every wall hit
ENDS the particle's free path and counts as a collision
(Open_Air_Pore_MC.py:257-348).  The combined audit+nudge pass runs after
the wall phase and after the pair phase (Open_Air_Pore_MC.py:512,550).
Case predicates follow Open_Air_Pore_MC.py:439-485 verbatim (sqrt-radius
comparisons, prior-position crossing detection).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import PoreConfig
from ..engine import WallLedger, Workload
from ..init import init_pore
from ..models.base import apply_tracked, pore_missed_case_audit
from ..ops import oob as oob_ops
from ..ops import walls as wall_ops


def make_pore_workload(cfg: PoreConfig) -> Workload:
    assert not cfg.energized
    geom = cfg.geometry
    physics = cfg.physics
    eng = cfg.engine
    h = geom.total_height
    oah = geom.open_air_height
    r_oa = geom.open_air_radius
    r_pore = geom.pore_coated_radius
    r_gap = geom.gap_radius
    cr_oa = geom.open_air_collision_radius(physics)
    cr_gap = geom.gap_collision_radius(physics)
    cr_pore = geom.pore_collision_radius(physics)
    gap_lo = geom.gap_bottom
    gap_hi = geom.gap_top

    def tracked(state, measure, total_hits, total_errs, case_mask, event_fn):
        paths_before = state.paths
        has_before = state.has_collided
        ev = event_fn(state, case_mask)
        state, measure, hits = apply_tracked(
            ev.state, measure, ev, case_mask, eng.num_bins,
            eng.hist_range[1], paths_before, has_before,
            zero_residual=False,
        )
        return (
            state,
            measure,
            total_hits + hits,
            total_errs + jnp.sum(ev.err_mask, dtype=jnp.int32),
        )

    def wall_pass(state, prior, measure, key):
        del key
        hits = jnp.zeros((), jnp.int32)
        errs = jnp.zeros((), jnp.int32)
        px, py, pz = prior[:, 0], prior[:, 1], prior[:, 2]
        prior_r = jnp.sqrt(px * px + py * py)

        def radius(pos):
            return jnp.sqrt(pos[:, 0] ** 2 + pos[:, 1] ** 2)

        # CASE 1: specular side of the open-air cylinder (:442-443).
        mask = radius(state.pos) > r_oa
        state, measure, hits, errs = tracked(
            state, measure, hits, errs, mask,
            lambda s, m: wall_ops.specular_cylinder(s, m, cr_oa),
        )

        # CASE 2: exterior z caps (:448-452).
        mask = state.pos[:, 2] < 0.0
        state, measure, hits, errs = tracked(
            state, measure, hits, errs, mask,
            lambda s, m: wall_ops.specular_plane(s, m, 2, 0.0),
        )
        mask = state.pos[:, 2] > h
        state, measure, hits, errs = tracked(
            state, measure, hits, errs, mask,
            lambda s, m: wall_ops.specular_plane(s, m, 2, h),
        )

        # CASE 3: annular faces where open air meets the pore (:457-461).
        mask = (pz > h - oah) & (state.pos[:, 2] < h - oah) & (
            radius(state.pos) > r_pore
        )
        state, measure, hits, errs = tracked(
            state, measure, hits, errs, mask,
            lambda s, m: wall_ops.specular_plane(s, m, 2, h - oah),
        )
        mask = (pz < oah) & (state.pos[:, 2] > oah) & (
            radius(state.pos) > r_pore
        )
        state, measure, hits, errs = tracked(
            state, measure, hits, errs, mask,
            lambda s, m: wall_ops.specular_plane(s, m, 2, oah),
        )

        # CASE 4: gap interior side wall (:465-467).
        mask = (
            (pz < h - oah - geom.cold_coating_height)
            & (pz > gap_lo)
            & (prior_r < r_gap)
            & (radius(state.pos) > r_gap)
        )
        state, measure, hits, errs = tracked(
            state, measure, hits, errs, mask,
            lambda s, m: wall_ops.specular_cylinder(s, m, cr_gap),
        )

        # CASE 5: gap cylinder bases (:472-478).
        in_gap_prior = (pz < gap_hi) & (pz > gap_lo)
        mask = (prior_r > r_pore) & (state.pos[:, 2] < gap_lo) & in_gap_prior
        state, measure, hits, errs = tracked(
            state, measure, hits, errs, mask,
            lambda s, m: wall_ops.specular_plane(s, m, 2, gap_lo),
        )
        mask = (prior_r > r_pore) & (state.pos[:, 2] > gap_hi) & in_gap_prior
        state, measure, hits, errs = tracked(
            state, measure, hits, errs, mask,
            lambda s, m: wall_ops.specular_plane(s, m, 2, gap_hi),
        )

        # CASE 6: coated pore side wall, treated as specular (:482-485).
        z = state.pos[:, 2]
        in_cold = (z < h - oah) & (z > gap_hi)
        in_hot = (z < gap_lo) & (z > oah)
        mask = (
            (prior_r < r_pore)
            & (radius(state.pos) > r_pore)
            & (in_cold | in_hot)
        )
        state, measure, hits, errs = tracked(
            state, measure, hits, errs, mask,
            lambda s, m: wall_ops.specular_cylinder(s, m, cr_pore),
        )

        zero = jnp.zeros((), state.pos.dtype)
        ledger = WallLedger(
            momentum_z=zero, energy_hot=zero, energy_cold=zero,
            wall_hits=hits, errs=errs,
        )
        return state, measure, ledger

    def fix(state):
        return oob_ops.pore_v1_audit_nudge(state, geom, physics)

    return Workload(
        cfg=cfg,
        init_fn=lambda key: init_pore(cfg, key),
        wall_pass=wall_pass,
        post_wall=fix,
        post_pairs=fix,
        fluid_volume=geom.volume,
        audit_fn=lambda state, prior: pore_missed_case_audit(
            state, prior, geom, physics, energized=False
        ),
    )
