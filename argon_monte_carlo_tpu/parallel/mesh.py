"""Device-mesh helpers for the z-slab domain-decomposed engine."""

from __future__ import annotations

import jax

AXIS = "z"


def make_mesh(n_devices: int | None = None, devices=None) -> jax.sharding.Mesh:
    """A 1-D mesh over ``n_devices`` (default: all visible devices).

    The engine decomposes the simulation domain into z-slabs, one per
    device, with ring-neighbour halo exchange over ICI -- the TPU-native
    replacement for the reference's process pool (SURVEY.md section 2.3).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh({n_devices}) but only {len(devices)} devices "
                f"are visible ({[d.platform for d in devices]}); a "
                "silently-truncated mesh would run a vacuous 1-shard "
                "simulation"
            )
        devices = devices[:n_devices]
    import numpy as np

    return jax.sharding.Mesh(np.array(devices), (AXIS,))
