"""Stage 3 (north-star) workload: energized thruster pore.

Reference Temperature_Pore_MC.py.  Specular open-air walls (cases 1-2, no
path bookkeeping, :311-347); Debye thermal walls everywhere the pore
coatings or the alumina gap are exposed (cases 3-6, :349-553), each
contributing to the per-step momentum-z / hot / cold energy ledger
(:685-758).  Recapture runs after walls and after pair collisions
(:804, :844).

Predicates follow :690-753 verbatim, including the argon_radius insets and
squared-radius comparisons.

RNG note: the reference draws fresh rejection-sampled directions per
impact from host RNG streams.  Here one (N, 2) uniform block per timestep
feeds every energized case's closed-form cone sampler; a particle uses its
own lane, so draws are independent across particles and steps.  Only a
particle handled by two energized cases in the SAME step would reuse its
draw -- a chain the reference's sequential masks make similarly rare, with
no statistical consequence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import PoreConfig
from ..engine import WallLedger, Workload
from ..init import init_pore
from .. import rng
from ..models.base import apply_tracked, pore_missed_case_audit
from ..ops import oob as oob_ops
from ..ops import walls as wall_ops


def make_temperature_pore_workload(cfg: PoreConfig) -> Workload:
    assert cfg.energized
    geom = cfg.geometry
    physics = cfg.physics
    eng = cfg.engine
    ar = physics.argon_radius
    mass = physics.mass
    h = geom.total_height
    oah = geom.open_air_height
    r_oa = geom.open_air_radius
    cr_oa = geom.open_air_collision_radius(physics)
    cr_gap = geom.gap_collision_radius(physics)
    cr_pore = geom.pore_collision_radius(physics)
    gap_lo = geom.gap_bottom
    gap_hi = geom.gap_top
    cos_cone = wall_ops.cos_cone_from_deg(cfg.cone_half_angle_deg)
    alpha_coat = cfg.coated_accommodation_coeff
    alpha_gap = cfg.gap_accommodation_coeff
    e_cold = cfg.surface_energy_cold
    e_hot = cfg.surface_energy_hot
    gap_table = cfg.gap_energy_table()
    # Host-side Chebyshev fit of E_surf(z); pure arithmetic on device.
    gap_interp = wall_ops.gap_energy_interp(
        gap_table.z_lo, gap_table.z_hi, gap_table.energies
    )
    # z_inset for recapture scales with the geometry (reference hard-codes
    # 50nm for the default size, Temperature_Pore_MC.py:599).
    z_inset = 0.5 * oah

    def wall_pass(state, prior, measure, key):
        dtype = state.pos.dtype
        uniforms = jax.random.uniform(
            key, (state.pos.shape[0], 2), dtype
        )
        # One shared trig evaluation feeds every energized case's cone
        # draw this step (rng.cone_trig docstring).
        trig = rng.cone_trig(uniforms, cos_cone)

        momentum_z = jnp.zeros((), dtype)
        energy_hot = jnp.zeros((), dtype)
        energy_cold = jnp.zeros((), dtype)
        hits = jnp.zeros((), jnp.int32)
        errs = jnp.zeros((), jnp.int32)

        px, py, pz = prior[:, 0], prior[:, 1], prior[:, 2]
        prior_r2 = px * px + py * py

        def r2(pos):
            return pos[:, 0] ** 2 + pos[:, 1] ** 2

        def energized(state, measure, case_mask, event_fn):
            paths_before = state.paths
            has_before = state.has_collided
            ev = event_fn(state, case_mask)
            state, measure, case_hits = apply_tracked(
                ev.state, measure, ev, case_mask, eng.num_bins,
                eng.hist_range[1], paths_before, has_before,
                zero_residual=True,
            )
            return (
                state, measure, case_hits, ev.momentum_z, ev.energy,
                jnp.sum(ev.err_mask, dtype=jnp.int32),
            )

        # CASE 1: bare specular open-air cylinder side (:693-694).
        mask = jnp.sqrt(r2(state.pos)) > r_oa
        ev = wall_ops.specular_cylinder(state, mask, cr_oa)
        state = ev.state
        errs = errs + jnp.sum(ev.err_mask, dtype=jnp.int32)

        # CASE 2: bare specular z caps (:699-703).
        ev = wall_ops.specular_plane(state, state.pos[:, 2] < 0.0, 2, 0.0)
        state = ev.state
        ev = wall_ops.specular_plane(state, state.pos[:, 2] > h, 2, h)
        state = ev.state

        # CASE 3: coated annular faces (:708-716).
        plane_cold = h - oah + ar
        mask = (pz >= plane_cold) & (state.pos[:, 2] < plane_cold) & (
            r2(state.pos) > geom.pore_coated_radius**2
        )
        state, measure, ch, dpz, de, er = energized(
            state, measure, mask,
            lambda s, m: wall_ops.energized_plane(
                s, m, plane_cold, 1.0, e_cold, alpha_coat, mass, trig,
            ),
        )
        hits, momentum_z, energy_cold = hits + ch, momentum_z + dpz, energy_cold + de
        errs = errs + er

        plane_hot = oah - ar
        mask = (pz <= plane_hot) & (state.pos[:, 2] > plane_hot) & (
            r2(state.pos) > geom.pore_coated_radius**2
        )
        state, measure, ch, dpz, de, er = energized(
            state, measure, mask,
            lambda s, m: wall_ops.energized_plane(
                s, m, plane_hot, -1.0, e_hot, alpha_coat, mass, trig,
            ),
        )
        hits, momentum_z, energy_hot = hits + ch, momentum_z + dpz, energy_hot + de
        errs = errs + er

        # CASE 4: alumina gap side wall with the temperature ramp (:720-723).
        mask = (
            (pz < gap_hi - ar)
            & (pz > gap_lo + ar)
            & (prior_r2 <= cr_gap**2)
            & (r2(state.pos) > cr_gap**2)
        )
        state, measure, ch, dpz, de, er = energized(
            state, measure, mask,
            lambda s, m: wall_ops.energized_cylinder(
                s, m, cr_gap, gap_interp, alpha_gap, mass, trig,
            ),
        )
        hits, momentum_z = hits + ch, momentum_z + dpz
        errs = errs + er  # gap case tracks momentum only (:485-553)

        # CASE 5: gap cylinder bases (:728-738).
        in_gap_prior = (pz <= gap_hi - ar) & (pz >= gap_lo + ar)
        mask = (
            (prior_r2 >= cr_pore**2)
            & (state.pos[:, 2] < gap_lo + ar)
            & in_gap_prior
        )
        state, measure, ch, dpz, de, er = energized(
            state, measure, mask,
            lambda s, m: wall_ops.energized_plane(
                s, m, gap_lo + ar, 1.0, e_hot, alpha_coat, mass, trig,
            ),
        )
        hits, momentum_z, energy_hot = hits + ch, momentum_z + dpz, energy_hot + de
        errs = errs + er
        mask = (
            (prior_r2 >= cr_pore**2)
            & (state.pos[:, 2] > gap_hi - ar)
            & in_gap_prior
        )
        state, measure, ch, dpz, de, er = energized(
            state, measure, mask,
            lambda s, m: wall_ops.energized_plane(
                s, m, gap_hi - ar, -1.0, e_cold, alpha_coat, mass, trig,
            ),
        )
        hits, momentum_z, energy_cold = hits + ch, momentum_z + dpz, energy_cold + de
        errs = errs + er

        # CASE 6: coated pore side wall, hot then cold bands (:743-753).
        crossed = (prior_r2 <= cr_pore**2) & (r2(state.pos) > cr_pore**2)
        z = state.pos[:, 2]
        mask = crossed & (z <= gap_lo + ar) & (z >= oah - ar)
        state, measure, ch, dpz, de, er = energized(
            state, measure, mask,
            lambda s, m: wall_ops.energized_cylinder(
                s, m, cr_pore, e_hot, alpha_coat, mass, trig,
            ),
        )
        hits, momentum_z, energy_hot = hits + ch, momentum_z + dpz, energy_hot + de
        errs = errs + er
        crossed = (prior_r2 <= cr_pore**2) & (r2(state.pos) > cr_pore**2)
        z = state.pos[:, 2]
        mask = crossed & (z < h - oah + ar) & (z > gap_hi - ar)
        state, measure, ch, dpz, de, er = energized(
            state, measure, mask,
            lambda s, m: wall_ops.energized_cylinder(
                s, m, cr_pore, e_cold, alpha_coat, mass, trig,
            ),
        )
        hits, momentum_z, energy_cold = hits + ch, momentum_z + dpz, energy_cold + de
        errs = errs + er

        ledger = WallLedger(
            momentum_z=momentum_z, energy_hot=energy_hot,
            energy_cold=energy_cold, wall_hits=hits, errs=errs,
        )
        return state, measure, ledger

    def fix(state):
        return oob_ops.pore_recapture(state, geom, z_inset)

    return Workload(
        cfg=cfg,
        init_fn=lambda key: init_pore(cfg, key),
        wall_pass=wall_pass,
        post_wall=fix,
        post_pairs=fix,
        fluid_volume=geom.volume,
        audit_fn=lambda state, prior: pore_missed_case_audit(
            state, prior, geom, physics, energized=True
        ),
    )
