"""Vectorized arithmetic-coder bit model vs an integer-exact reference.

dsp/encoder.py:bit_consumption runs the model in f32 (exact for integers
below 2^24) with one-hot bf16 matmul lookups. This checks it against a
straight integer implementation of the reference semantics
(spectral_quantization.rs:265-348), including full-scale spectra whose
running estimate exceeds 2^24 — there the f32 totals may round, but every
decision (truncation point, fits thresholds, mode flags) must still match
because all thresholds sit far below 2^24 and the estimate is monotone.
"""

import jax
import numpy as np

from lc3jax import tables as T
from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.dsp.encoder import bit_consumption, encoder_params


def _reference_bits(x_q, nbits, nbits_spec, fs_ind, ne):
    """Integer-exact port of the reference tuple walk."""
    lookup = np.asarray(T.AC_SPEC_LOOKUP, np.int64)
    bits_tab = np.asarray(T.AC_SPEC_BITS, np.int64)
    rate_flag = 512 if nbits > (160 + fs_ind * 160) else 0
    mode_flag = nbits >= (480 + fs_ind * 160)

    pairs = x_q.reshape(ne // 2, 2)
    nz = np.any(pairs != 0, axis=1)
    lastnz = 2 * (np.max(np.nonzero(nz)[0]) + 1) if nz.any() else 2
    lastnz = max(lastnz, 2)

    c = 0
    est = 0
    trunc = 0
    nlsb = 0
    lastnz_tr = 2
    for n in range(0, lastnz, 2):
        a0, b0 = abs(int(pairs[n // 2, 0])), abs(int(pairs[n // 2, 1]))
        t = c + rate_flag + (256 if n > ne // 2 else 0)
        a, b, depth = a0, b0, 0
        while max(a, b) >= 4:
            pki = lookup[t + min(depth, 3) * 1024]
            est += bits_tab[pki, 16]
            if depth == 0 and mode_flag:
                nlsb += 2
            else:
                est += 2 * 2048
            a >>= 1
            b >>= 1
            depth += 1
        lev = min(depth, 3)
        pki = lookup[t + lev * 1024]
        sym = a + 4 * b
        est += bits_tab[pki, sym]
        if a0 > 0:
            est += 2048
        if b0 > 0:
            est += 2048
        if mode_flag and lev > 0:
            if (a0 >> 1) == 0 and a0 != 0:
                nlsb += 1
            if (b0 >> 1) == 0 and b0 != 0:
                nlsb += 1
        if (a0 != 0 or b0 != 0) and int(np.ceil(est / 2048)) <= nbits_spec:
            lastnz_tr = n + 2
            trunc = est
        tn = 1 + (a + b) * (lev + 1) if lev <= 1 else 12 + lev
        c = (c & 15) * 16 + tn
    return dict(
        lastnz=lastnz, lastnz_trunc=lastnz_tr,
        nbits_est=int(np.ceil(est / 2048)) + nlsb,
        nbits_trunc=int(np.ceil(trunc / 2048)), nbits_lsb=nlsb,
        est=est,
    )


def _check(x_q_batch, nbits, nbits_spec_val):
    cfg = Lc3Config.new(48000, FrameDuration.MS10)
    p = encoder_params(cfg)
    S, ne = x_q_batch.shape
    nbits_spec = jax.numpy.full(S, nbits_spec_val, jax.numpy.int32)
    bc = jax.jit(lambda xq, ns: bit_consumption(p, xq, nbits, ns))(
        jax.numpy.asarray(x_q_batch), nbits_spec
    )
    for s in range(S):
        ref = _reference_bits(x_q_batch[s], nbits, nbits_spec_val, cfg.fs_ind, ne)
        assert int(bc["lastnz"][s]) == ref["lastnz"], s
        assert int(bc["lastnz_trunc"][s]) == ref["lastnz_trunc"], s
        assert int(bc["nbits_trunc"][s]) == ref["nbits_trunc"], s
        assert int(bc["nbits_lsb"][s]) == ref["nbits_lsb"], s
        if ref["est"] < (1 << 24):
            assert int(bc["nbits_est"][s]) == ref["nbits_est"], s
        else:
            # f32 rounding above 2^24: total may differ by a few units of
            # 1/2048 bit, never enough to cross the (far smaller) decision
            # thresholds
            assert abs(int(bc["nbits_est"][s]) - ref["nbits_est"]) <= 2, s


def test_bit_model_moderate_spectra():
    rng = np.random.default_rng(0)
    x = rng.integers(-40, 41, (8, 400)).astype(np.int32)
    x[:, 350:] = 0
    _check(x, nbits=1200, nbits_spec_val=1000)


def test_bit_model_full_scale_overflows_f32_mantissa():
    rng = np.random.default_rng(1)
    # full-scale noise: running estimate far exceeds 2^24 units
    x = rng.integers(-32767, 32768, (4, 400)).astype(np.int32)
    _check(x, nbits=1200, nbits_spec_val=1000)


def test_bit_model_lsb_mode_rates():
    rng = np.random.default_rng(2)
    x = rng.integers(-200, 201, (4, 400)).astype(np.int32)
    # nbits >= 480+4*160 = 1120 -> mode_flag on at fs_ind 4
    _check(x, nbits=2400, nbits_spec_val=2000)
