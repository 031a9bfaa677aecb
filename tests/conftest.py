import os

# Multi-chip sharding tests run on a virtual 8-device CPU mesh; the real-TPU
# benchmark path is exercised separately by bench.py. The environment exports
# JAX_PLATFORMS=axon (single remote TPU via tunnel) which would make every
# test dispatch over RPC — force CPU before jax initialises.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the bitstream-on-device program takes
# minutes to compile on CPU; cache it across test processes
jax.config.update("jax_compilation_cache_dir", "/tmp/lc3jax-xla-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from pathlib import Path

import numpy as np
import pytest

GOLDENS = Path(__file__).parent / "goldens"


@pytest.fixture(scope="session")
def goldens():
    def load(name: str):
        return np.load(GOLDENS / f"{name}.npz")

    return load
