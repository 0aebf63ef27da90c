"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is tested without TPU hardware via XLA's host
platform device count (SURVEY.md section 4).  Must run before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the host env pins the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
