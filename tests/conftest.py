"""Test configuration: force an 8-virtual-device CPU platform so mesh /
sharding tests run hermetically without TPU hardware (the TPU-native
answer to distributed testing — SURVEY.md §4)."""

import os

# Must run before jax is imported anywhere. Forced (not setdefault): the
# host environment pins JAX_PLATFORMS=axon (remote TPU tunnel), which
# would route every test op through remote compilation.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
