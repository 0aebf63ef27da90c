"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is tested without TPU hardware via XLA's host
platform device count (SURVEY.md section 4).

This environment pins ``JAX_PLATFORMS=axon`` and a sitecustomize module
registers the TPU PJRT plugin at interpreter startup, so jax backends are
already initialized before conftest runs and mutating ``os.environ`` alone
has no effect.  The fix: set the env vars anyway (harmless), then force the
platform through jax.config and ``jax.extend.backend.clear_backends()`` so
the CPU client is (re)created under the new XLA_FLAGS.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# Per-host persistent compile cache: the suite's wall time is dominated
# by XLA:CPU compiles of the equivalence tests' many engine configs
# (slowest tests 100-190s each, nearly all compile).  A dedicated dir
# (NOT shared with the TPU bench cache: mixed-backend dirs produced
# cpu_aot_loader machine-feature mismatches) makes repeat suite runs
# load those executables from disk.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("ARGON_TEST_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_argon_tests")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

if jax.devices()[0].platform != "cpu" or len(jax.devices()) < 8:
    # Backends were initialized before this file ran (pinned platform).
    import jax.extend.backend as _jeb

    jax.config.update("jax_platforms", "cpu")
    _jeb.clear_backends()

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) >= 8, (
    "test harness failed to obtain the 8-device virtual CPU mesh: "
    f"{jax.devices()}"
)
