"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the driver's multi-chip dry-run environment so sharding tests get
real multi-device coverage without TPU hardware (SURVEY.md §4).

Note: the container's sitecustomize imports jax at interpreter startup and
registers the TPU ('axon') backend, so env vars alone are too late — we must
go through jax.config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
