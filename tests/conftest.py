"""Test configuration: force an 8-device virtual CPU mesh so every test —
including the multi-chip sharding tests — runs without TPU hardware."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
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
