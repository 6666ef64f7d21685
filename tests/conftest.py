"""Test env: force CPU backend with 8 virtual devices, so pjit/Mesh sharding
tests exercise real collectives without TPU hardware (SURVEY.md section 4,
item 4).

NOTE: env vars alone are NOT enough in this container — the axon PJRT plugin
registers itself via sitecustomize for every python process and outranks
``JAX_PLATFORMS=cpu`` whenever the TPU tunnel is free. ``jax.config.update``
after import is authoritative, so we import jax here (conftest runs before any
test module) and pin the platform explicitly.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.local_device_count() == 8, jax.local_device_count()
