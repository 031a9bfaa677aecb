"""Pallas bit-model kernel vs the XLA one-hot path: integer-exact parity.

The kernel (lc3jax/dsp/pallas_bitmodel.py) must produce the identical
bit-consumption dict for any quantized spectrum, since spectral_quantize's
gain adjustment and lastnz truncation key off these integers
(spectral_quantization.rs:265-348).
"""

import numpy as np
import pytest

from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.dsp import encoder as E


def _random_spectra(rng, S, ne):
    # heavy-tailed magnitudes to exercise every escape-ladder depth
    mag = (rng.standard_normal((S, ne)) * 3).astype(np.int64)
    boost = rng.integers(0, 15, (S, ne))
    x = mag * (1 << boost) // 8
    x = np.clip(x, -32768, 32767).astype(np.int32)
    # some all-zero and some sparse rows
    x[0] = 0
    x[1, ne // 2 :] = 0
    return x


@pytest.mark.parametrize("nbits", [320, 1200, 2400])
def test_bitmodel_pallas_matches_xla(nbits):
    cfg = Lc3Config.new(48000, FrameDuration.MS10)
    p = E.encoder_params(cfg)
    rng = np.random.default_rng(7)
    S = 8
    x_q = _random_spectra(rng, S, cfg.ne)
    nbits_spec = np.full(S, nbits - 300, np.int32)

    import jax.numpy as jnp

    ref = E.bit_consumption(p, jnp.asarray(x_q), nbits, jnp.asarray(nbits_spec),
                            use_pallas=False)

    # interpret-mode kernel on CPU via the same entry point
    from unittest import mock

    from lc3jax.dsp import pallas_bitmodel as PB

    orig = PB.bitmodel_table_part

    def interp(c, g, sym, rate_flag, ne, interpret=False, **kw):
        return orig(c, g, sym, rate_flag, ne, interpret=True, **kw)

    # S=8 is not a multiple of 128: pad streams like the production caller
    pad = 128 - S
    x_pad = np.concatenate([x_q, np.zeros((pad, cfg.ne), np.int32)])
    nsp_pad = np.concatenate([nbits_spec, np.full(pad, nbits - 300, np.int32)])
    with mock.patch.object(PB, "bitmodel_table_part", interp):
        got = E.bit_consumption(p, jnp.asarray(x_pad), nbits,
                                jnp.asarray(nsp_pad), use_pallas=True)

    for k in ("lastnz", "lastnz_trunc", "nbits_est", "nbits_trunc", "nbits_lsb"):
        np.testing.assert_array_equal(
            np.asarray(ref[k]), np.asarray(got[k])[:S], err_msg=k
        )


def test_bitmodel_pallas_odd_tuple_count():
    # 8 kHz @ 7.5 ms has ne = 60 -> NT = 30, not a multiple of 8: exercises
    # the row-padding path
    cfg = Lc3Config.new(8000, FrameDuration.MS7P5)
    p = E.encoder_params(cfg)
    rng = np.random.default_rng(3)
    x_q = _random_spectra(rng, 128, cfg.ne)
    nbits_spec = np.full(128, 200, np.int32)

    import jax.numpy as jnp

    from unittest import mock

    from lc3jax.dsp import pallas_bitmodel as PB

    ref = E.bit_consumption(p, jnp.asarray(x_q), 320, jnp.asarray(nbits_spec),
                            use_pallas=False)
    orig = PB.bitmodel_table_part

    def interp(c, g, sym, rate_flag, ne, interpret=False, **kw):
        return orig(c, g, sym, rate_flag, ne, interpret=True, **kw)

    with mock.patch.object(PB, "bitmodel_table_part", interp):
        got = E.bit_consumption(p, jnp.asarray(x_q), 320,
                                jnp.asarray(nbits_spec), use_pallas=True)
    for k in ("lastnz", "lastnz_trunc", "nbits_est", "nbits_trunc", "nbits_lsb"):
        np.testing.assert_array_equal(
            np.asarray(ref[k]), np.asarray(got[k]), err_msg=k
        )
