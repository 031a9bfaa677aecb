"""Pallas range-decoder kernel vs the XLA device parser: exact parity.

The kernel (lc3jax/coding/pallas_parse.py) must reproduce the XLA device
parser (itself fuzz-locked to the Python and C++ host parsers) field for
field — including bad_frame flags on garbage input. Interpret mode keeps
this on CPU; the smallest geometry (8 kHz / 7.5 ms, NT=30) keeps it fast.
"""

import dataclasses

import numpy as np
import pytest

from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.coding.device import device_parse
from lc3jax.coding.pallas_parse import device_parse_pallas
from lc3jax.ref.encoder import Lc3Encoder

CFG = Lc3Config.new(8000, FrameDuration.MS7P5)


def _mixed_batch(nbytes, seed, n_valid=6, n_bad=2, reps=16):
    enc = Lc3Encoder(1, CFG.n_ms, CFG.fs)
    rng = np.random.default_rng(seed)
    t = np.arange(CFG.nf) / CFG.fs
    rows = []
    for i in range(n_valid):
        pcm = (
            6000 * np.sin(2 * np.pi * (150 + 60 * i) * t)
            + rng.normal(0, 600, CFG.nf)
        ).astype(np.int16)
        rows.append(
            np.frombuffer(bytes(enc.encode_frame(0, pcm, nbytes)), np.uint8)
        )
    for _ in range(n_bad):
        rows.append(rng.integers(0, 256, nbytes, dtype=np.uint8))
    return np.stack(rows * reps)


@pytest.mark.parametrize("nbytes", [20, 40])
def test_parse_kernel_matches_xla_parser(nbytes):
    import jax.numpy as jnp

    batch = _mixed_batch(nbytes, seed=3)
    ref = device_parse(CFG, nbytes, jnp.asarray(batch), use_pallas=False)
    got = device_parse_pallas(CFG, nbytes, jnp.asarray(batch), interpret=True)
    for f in dataclasses.fields(ref):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, f.name)),
            np.asarray(getattr(got, f.name)),
            err_msg=f.name,
        )
