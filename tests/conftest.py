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
# Keep the env var in agreement: the CLIs re-assert JAX_PLATFORMS from
# the environment at import (utils.misc.honor_jax_platforms_env, the
# counter to sitecustomize's clobber), so a stray JAX_PLATFORMS=axon
# inherited from the shell would flip an in-process `import audio_test`
# back to the tunnel; CLI subprocesses spawned by tests inherit it too.
os.environ["JAX_PLATFORMS"] = "cpu"

import pytest  # noqa: E402

# Modules excluded from `-m fast` (e2e training, torch-oracle fidelity
# sweeps, subprocess-spawning suites). Everything else is marked fast;
# `python -m pytest tests/ -m fast -q` is the pre-commit gate — ~15-20
# min wall (measured 17:28 under host contention, round-3 VERDICT).
SLOW_MODULES = {
    "test_e2e_train.py",
    "test_multihost.py",
    "test_driver_contract.py",
    "test_resilience.py",
    "test_tdanet_best_fidelity.py",
    "test_config_fuzz_fidelity.py",
    "test_emcad_config_fuzz.py",
    "test_variants_fidelity.py",
    "test_emcad_models_fidelity.py",
    "test_grad_fidelity.py",
    "test_golden_audio_mix.py",
    "test_training_learns.py",
    "test_ckpt_interchange.py",
    "test_training_parity.py",
    "test_worker_recycle.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = os.path.basename(str(item.fspath))
        marker = "slow" if name in SLOW_MODULES else "fast"
        item.add_marker(getattr(pytest.mark, marker))
