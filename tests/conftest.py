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
    flags += " --xla_force_host_platform_device_count=8"
# 8 virtual devices share this host's core(s): XLA's out-of-order thunk
# scheduling makes device threads reach a given collective minutes apart in
# big sharded programs, and the default 40 s rendezvous deadline aborts the
# process (see __graft_entry__._force_cpu_mesh).
if "collective_call_terminate" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags.strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices())
)
assert len(jax.devices()) == 8
