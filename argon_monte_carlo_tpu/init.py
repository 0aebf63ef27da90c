"""Vectorized particle initialization for each geometry.

Replaces the reference's np.vectorize'd disk sampling and per-particle
velocity loops (Open_Air_Cube_MC.py:144-172, Open_Air_Pore_MC.py:106-158,
Temperature_Pore_MC.py:154-213) with pure jax.random sampling.  Matches the
reference in distribution (see rng.py docstring), not bitwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import rng
from .config import CubeConfig, PoreConfig
from .state import ParticleState


def _dtype(cfg_engine) -> jnp.dtype:
    return jnp.dtype(cfg_engine.dtype)


def init_cube(cfg: CubeConfig, key: jax.Array) -> ParticleState:
    """Uniform fill of the box.

    The reference stratifies: floor(N/15^3) particles uniform within each
    of the 15^3 cells plus a uniform remainder (Open_Air_Cube_MC.py:144-156)
    -- which is exactly a stratified uniform sample of the box.  Plain
    uniform sampling has the same single-particle distribution; the slight
    variance reduction of stratification has no effect on any measured
    output, so the default is the simpler uniform fill.
    ``CubeConfig.stratified_init=True`` selects the strict reference
    scheme (vectorized, one draw per cell block).
    """
    n = cfg.num_molecules
    dtype = _dtype(cfg.engine)
    kp, kv = jax.random.split(key)
    extent = jnp.asarray(
        [cfg.geometry.lx, cfg.geometry.ly, cfg.geometry.lz], dtype
    )
    if cfg.stratified_init:
        # Strict reference scheme (Open_Air_Cube_MC.py:144-156),
        # vectorized: q = floor(N/cells) particles uniform inside each
        # cell (one (cells, q, 3) draw offset by the cell origins), the
        # remainder uniform over the whole box.
        c = cfg.init_cells_per_axis
        cells = c * c * c
        q, r = divmod(n, cells)
        kc, kr = jax.random.split(kp)
        ijk = jnp.stack(
            jnp.meshgrid(*(jnp.arange(c),) * 3, indexing="ij"), axis=-1
        ).reshape(cells, 1, 3)
        local = jax.random.uniform(kc, (cells, q, 3), dtype)
        in_cells = ((ijk.astype(dtype) + local) / c * extent).reshape(
            cells * q, 3
        )
        rest = jax.random.uniform(kr, (r, 3), dtype) * extent
        pos = jnp.concatenate([in_cells, rest], axis=0)
    else:
        pos = jax.random.uniform(kp, (n, 3), dtype) * extent
    vel = rng.maxwell_velocities(kv, n, cfg.physics.a_shape, dtype)
    state = ParticleState.zeros(n, dtype)
    state.pos, state.vel = pos, vel
    return state


def init_pore(cfg: PoreConfig, key: jax.Array) -> ParticleState:
    """Per-segment uniform fill of the five-cylinder stack.

    Mirrors init_positions (Open_Air_Pore_MC.py:106-140,
    Temperature_Pore_MC.py:154-195): per segment, uniform in a disk of the
    segment radius inset by argon_radius; z uniform within the segment with
    argon_radius insets where the reference applies them.
    """
    g = cfg.geometry
    ar = cfg.physics.argon_radius
    counts = g.segment_particle_counts(cfg.num_molecules)
    n = cfg.num_molecules
    dtype = _dtype(cfg.engine)

    # (radius_inset, z_lo, z_hi) per segment, in reference order/insets.
    segments = [
        ("open_air_bottom", g.open_air_radius - ar, ar, g.open_air_height - ar),
        ("hot", g.pore_coated_radius - ar, g.open_air_height, g.gap_bottom),
        ("gap", g.gap_radius - ar, g.gap_bottom + ar, g.gap_top - ar),
        ("cold", g.pore_coated_radius - ar, g.gap_top, g.cold_top),
        ("open_air_top", g.open_air_radius - ar, g.cold_top + ar,
         g.total_height - ar),
    ]

    keys = jax.random.split(key, len(segments) + 1)
    xs, ys, zs = [], [], []
    for (name, radius, z_lo, z_hi), seg_key in zip(segments, keys[:-1]):
        m = counts[name]
        kxy, kz = jax.random.split(seg_key)
        x, y = rng.uniform_disk(kxy, m, radius, dtype)
        z = jax.random.uniform(kz, (m,), dtype, z_lo, z_hi)
        xs.append(x)
        ys.append(y)
        zs.append(z)

    pos = jnp.stack(
        [jnp.concatenate(xs), jnp.concatenate(ys), jnp.concatenate(zs)],
        axis=-1,
    )
    vel = rng.maxwell_velocities(keys[-1], n, cfg.physics.a_shape, dtype)
    state = ParticleState.zeros(n, dtype)
    state.pos, state.vel = pos, vel
    return state
