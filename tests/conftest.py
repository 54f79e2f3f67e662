"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment's sitecustomize pre-imports jax and pins the remote ``axon``
TPU platform (JAX_PLATFORMS=axon + plugin register), so a plain env-var
override is ineffective — tests must force the platform via
``jax.config.update`` AFTER import, and set the XLA host-device-count flag
before the CPU backend initializes (SURVEY.md §4f: mocked mesh testing).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices())
)
assert len(jax.devices()) == 8
