"""Pallas SNS PVQ kernel vs the XLA path: bit-exact parity.

The kernel (lc3jax/dsp/pallas_sns.py) mirrors the XLA pyramid's f32 fold
orders and comparison semantics exactly, so the full sns_analysis outputs
(shaped spectrum and every bitstream field) must be identical.
"""

import numpy as np
import pytest

from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.dsp import encoder as E


@pytest.mark.parametrize("fs", [48000, 16000])
def test_sns_pvq_pallas_matches_xla(fs):
    import jax.numpy as jnp

    from unittest import mock

    from lc3jax.dsp import pallas_sns as PS

    cfg = Lc3Config.new(fs, FrameDuration.MS10)
    p = E.encoder_params(cfg)
    rng = np.random.default_rng(11)
    S = 128
    # spectra with realistic dynamic range + degenerate rows
    x = (rng.standard_normal((S, cfg.ne)) * 10 ** rng.uniform(-2, 4, (S, 1))).astype(
        np.float32
    )
    x[0] = 0.0
    e_b = np.abs(rng.standard_normal((S, cfg.nb)) * 10 ** rng.uniform(-6, 6, (S, 1))).astype(np.float32)
    e_b[1] = 0.0
    attack = rng.integers(0, 2, S).astype(bool)

    ref_x, ref_f = E.sns_analysis(p, jnp.asarray(x), jnp.asarray(e_b),
                                  jnp.asarray(attack), use_pallas=False)

    orig = PS.sns_pvq_pallas

    def interp(t2rot, interpret=False):
        return orig(t2rot, interpret=True)

    with mock.patch.object(PS, "sns_pvq_pallas", interp):
        got_x, got_f = E.sns_analysis(p, jnp.asarray(x), jnp.asarray(e_b),
                                      jnp.asarray(attack), use_pallas=True)

    for k in ref_f:
        np.testing.assert_array_equal(np.asarray(ref_f[k]), np.asarray(got_f[k]),
                                      err_msg=k)
    np.testing.assert_array_equal(np.asarray(ref_x), np.asarray(got_x))
