"""Test configuration: force an 8-device virtual CPU mesh so every test —
including the multi-chip sharding tests — runs without TPU hardware."""
import os

# NB: this image's axon sitecustomize force-registers the TPU backend and
# overrides JAX_PLATFORMS; the legacy JAX_PLATFORM_NAME is applied later in
# xla_bridge and reliably selects the CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

REFERENCE_MODELS = "/root/reference/models"


@pytest.fixture(scope="session")
def models_dir():
    return REFERENCE_MODELS
