"""Out-of-bounds auditing and recapture (physical failure recovery).

The reference's only "fault tolerance": particles that escape the domain
through missed wall cases are counted and teleported back inside.

* Pore v1: ``num_out_of_bounds`` both counts AND nudges strays
  (z +- 10*argon_radius, radial -> axis; Open_Air_Pore_MC.py:354-375).
* Temperature pore: ``num_out_of_bounds`` is audit-only
  (Temperature_Pore_MC.py:560-592) and ``recapture_out_of_bounds``
  teleports (z -> 50nm inset, radial -> axis;
  Temperature_Pore_MC.py:594-616), called after the wall phase and after
  the pair phase (:804, :844).

Here both are fused device passes returning the count as a metric.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import PoreGeometry
from ..physics import GasPhysics
from ..state import ParticleState


def _r2(pos):
    return pos[:, 0] ** 2 + pos[:, 1] ** 2


def pore_oob_count(state: ParticleState, geom: PoreGeometry) -> jnp.ndarray:
    """Audit-only count, mirroring Temperature_Pore_MC.py:560-592."""
    x2y2 = _r2(state.pos)
    z = state.pos[:, 2]
    h = geom.total_height
    oah = geom.open_air_height
    c = jnp.sum(z < 0.0, dtype=jnp.int32)
    c += jnp.sum(z > h, dtype=jnp.int32)
    c += jnp.sum(
        (x2y2 > geom.open_air_radius**2) & (z >= 0.0) & (z <= oah),
        dtype=jnp.int32,
    )
    c += jnp.sum(
        (x2y2 > geom.open_air_radius**2) & (z >= h - oah) & (z <= h),
        dtype=jnp.int32,
    )
    c += jnp.sum(
        (x2y2 > geom.gap_radius**2)
        & (z >= geom.gap_bottom)
        & (z <= geom.gap_top),
        dtype=jnp.int32,
    )
    c += jnp.sum(
        (x2y2 > geom.pore_coated_radius**2)
        & (z > oah)
        & (z < geom.gap_bottom),
        dtype=jnp.int32,
    )
    c += jnp.sum(
        (x2y2 > geom.pore_coated_radius**2)
        & (z > geom.gap_top)
        & (z < h - oah),
        dtype=jnp.int32,
    )
    return c


def pore_recapture(state: ParticleState, geom: PoreGeometry,
                   z_inset: float = 50e-9):
    """Teleport escapees inside (Temperature_Pore_MC.py:594-616).

    Order matters and matches the reference: z first, then radial checks
    use the updated z.  Returns (state, num_recaptured).
    """
    pos = state.pos
    z = pos[:, 2]
    h = geom.total_height

    m1 = z < 0.0
    z = jnp.where(m1, z_inset, z)
    m2 = z > h
    z = jnp.where(m2, h - z_inset, z)

    x, y = pos[:, 0], pos[:, 1]
    x2y2 = x * x + y * y
    m3 = x2y2 > geom.open_air_radius**2
    x = jnp.where(m3, 0.0, x)
    y = jnp.where(m3, 0.0, y)

    x2y2 = x * x + y * y
    inside = (z > geom.open_air_height) & (z < h - geom.open_air_height)
    m4 = (x2y2 > geom.gap_radius**2) & inside
    x = jnp.where(m4, 0.0, x)
    y = jnp.where(m4, 0.0, y)

    x2y2 = x * x + y * y
    in_coated = ((z > geom.open_air_height) & (z < geom.gap_bottom)) | (
        (z > geom.gap_top) & (z < h - geom.open_air_height)
    )
    m5 = (x2y2 > geom.pore_coated_radius**2) & in_coated
    x = jnp.where(m5, 0.0, x)
    y = jnp.where(m5, 0.0, y)

    count = (
        jnp.sum(m1, dtype=jnp.int32)
        + jnp.sum(m2, dtype=jnp.int32)
        + jnp.sum(m3, dtype=jnp.int32)
        + jnp.sum(m4, dtype=jnp.int32)
        + jnp.sum(m5, dtype=jnp.int32)
    )
    state.pos = jnp.stack([x, y, z], axis=-1)
    return state, count


def pore_v1_audit_nudge(state: ParticleState, geom: PoreGeometry,
                        physics: GasPhysics):
    """Pore v1's combined audit+nudge (Open_Air_Pore_MC.py:354-375).

    z strays are nudged by 10*argon_radius; radial strays snap to the
    axis.  Returns (state, count).
    """
    ar = physics.argon_radius
    pos = state.pos
    z = pos[:, 2]
    h = geom.total_height

    m1 = z < 0.0
    z = jnp.where(m1, z + 10.0 * ar, z)
    m2 = z > h
    z = jnp.where(m2, z - 10.0 * ar, z)

    x, y = pos[:, 0], pos[:, 1]
    x2y2 = x * x + y * y
    m3 = x2y2 > geom.open_air_radius**2
    x = jnp.where(m3, 0.0, x)
    y = jnp.where(m3, 0.0, y)

    x2y2 = x * x + y * y
    inside = (z > geom.open_air_height) & (z < h - geom.open_air_height)
    m4 = (x2y2 > geom.gap_radius**2) & inside
    x = jnp.where(m4, 0.0, x)
    y = jnp.where(m4, 0.0, y)

    x2y2 = x * x + y * y
    in_coated = ((z > geom.open_air_height) & (z < geom.gap_bottom)) | (
        (z > geom.gap_top) & (z < h - geom.open_air_height)
    )
    m5 = (x2y2 > geom.pore_coated_radius**2) & in_coated
    x = jnp.where(m5, 0.0, x)
    y = jnp.where(m5, 0.0, y)

    count = (
        jnp.sum(m1, dtype=jnp.int32)
        + jnp.sum(m2, dtype=jnp.int32)
        + jnp.sum(m3, dtype=jnp.int32)
        + jnp.sum(m4, dtype=jnp.int32)
        + jnp.sum(m5, dtype=jnp.int32)
    )
    state.pos = jnp.stack([x, y, z], axis=-1)
    return state, count
