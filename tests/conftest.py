import os

# Multi-chip sharding tests run on a virtual 8-device CPU mesh; the real-TPU
# benchmark path is exercised separately by bench.py.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

from pathlib import Path

import numpy as np
import pytest

GOLDENS = Path(__file__).parent / "goldens"


@pytest.fixture(scope="session")
def goldens():
    def load(name: str):
        return np.load(GOLDENS / f"{name}.npz")

    return load
