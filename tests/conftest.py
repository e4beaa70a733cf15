"""Test configuration: force an 8-device virtual CPU mesh so every test —
including the multi-chip sharding tests — runs without TPU hardware."""
import os

# XLA_FLAGS must be in the environment before the CPU client initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Env-var platform selection (JAX_PLATFORMS / JAX_PLATFORM_NAME) is NOT
# reliable on machines where a sitecustomize registers a PJRT plugin and
# force-overrides the platform list (this image's axon TPU tunnel does).
# jax.config.update applies at backend-init time and wins — verified fix.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_MODELS = "/root/reference/models"


@pytest.fixture(scope="session")
def models_dir():
    return REFERENCE_MODELS
