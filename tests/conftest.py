"""Test env: force CPU backend with 8 virtual devices BEFORE jax import,
so pjit/Mesh sharding tests exercise real collectives without TPU hardware
(SURVEY.md section 4, item 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
