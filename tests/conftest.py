"""Test configuration: force an 8-virtual-device CPU platform so mesh /
sharding tests run hermetically without TPU hardware (the TPU-native
answer to distributed testing — SURVEY.md §4).

The host environment registers a remote-TPU PJRT plugin ('axon') via
sitecustomize in EVERY python process and overrides jax_platforms, so
env vars alone are not enough: the factory is popped before any backend
initializes, otherwise each test op round-trips a network tunnel.
"""

import os

# Must run before jax initializes any backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# NOTE: do NOT enable jax_compilation_cache_dir here. Reloading
# persisted CPU-backend executables hard-crashes the interpreter
# ("Fatal Python error" in the first jitted solver step) on this
# jax build — the suite must recompile each run.

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8
