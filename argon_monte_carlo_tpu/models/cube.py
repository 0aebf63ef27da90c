"""Stage 1 workload: specular cube (reference Open_Air_Cube_MC.py).

Six specular plane walls; walls do NOT end free paths (only pair
collisions do, Open_Air_Cube_MC.py:189-226 vs 267-280).  No recapture pass
exists in the reference cube script.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import CubeConfig
from ..engine import WallLedger, Workload
from ..init import init_cube
from ..ops import walls as wall_ops


def make_cube_workload(cfg: CubeConfig) -> Workload:
    geom = cfg.geometry

    def wall_pass(state, prior_pos, measure, key):
        del prior_pos, key
        zero = jnp.zeros((), state.pos.dtype)
        for axis, hi in ((0, geom.lx), (1, geom.ly), (2, geom.lz)):
            ev = wall_ops.specular_plane(
                state, state.pos[:, axis] > hi, axis, hi
            )
            state = ev.state
            ev = wall_ops.specular_plane(
                state, state.pos[:, axis] < 0.0, axis, 0.0
            )
            state = ev.state
        ledger = WallLedger(
            momentum_z=zero, energy_hot=zero, energy_cold=zero,
            wall_hits=jnp.zeros((), jnp.int32),
            errs=jnp.zeros((), jnp.int32),
        )
        return state, measure, ledger

    def null_fix(state):
        return state, jnp.zeros((), jnp.int32)

    return Workload(
        cfg=cfg,
        init_fn=lambda key: init_cube(cfg, key),
        wall_pass=wall_pass,
        post_wall=null_fix,
        post_pairs=null_fix,
        fluid_volume=geom.volume,
    )
