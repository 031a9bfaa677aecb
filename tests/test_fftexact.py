"""Batched kissfft DCT-IV vs the oracle: bit-exact, numpy and jitted XLA.

The batched formulation (dsp/fftexact.py) must reproduce every f32
rounding of lc3jax.ref.fft (itself pinned to the reference's
common/kissfft.rs + common/dct_iv.rs by the golden-vector tests). The
jitted case additionally proves the opaque-zero fma-contraction guard
holds against this jaxlib's XLA CPU pipeline — without the guard, the
fusion emitter contracts mul+add chains into fmas and ~60% of outputs
move by an ulp (see the module docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lc3jax.dsp.fftexact import BatchedFaithfulDctIV, BatchedFaithfulFFT
from lc3jax.ref.fft import FaithfulDctIV, FaithfulFFT

# all (nf/2) FFT lengths and nf DCT lengths reachable from the 12 configs
FFT_SIZES = [30, 40, 60, 80, 90, 120, 160, 180, 240]
DCT_SIZES = [60, 80, 120, 160, 180, 240, 320, 360, 480]


@pytest.mark.parametrize("nfft", FFT_SIZES)
def test_fft_bit_exact_numpy(nfft):
    rng = np.random.default_rng(nfft)
    ref = FaithfulFFT(nfft)
    bat = BatchedFaithfulFFT(nfft)
    S = 6
    xr = rng.standard_normal((S, nfft)).astype(np.float32) * 1000
    xi = rng.standard_normal((S, nfft)).astype(np.float32) * 1000
    br, bi = bat(xr, xi, xp=np)
    for s in range(S):
        rr, ri = ref(xr[s], xi[s])
        assert np.array_equal(rr, br[s]) and np.array_equal(ri, bi[s])


@pytest.mark.parametrize("nf", DCT_SIZES)
def test_dct_iv_bit_exact_jit(nf):
    rng = np.random.default_rng(nf)
    ref = FaithfulDctIV(nf)
    bat = BatchedFaithfulDctIV(nf)
    f = jax.jit(lambda x: bat(x, xp=jnp, zero=x[0:1, 0:1] * np.float32(0.0)))
    S = 6
    # int16-scaled content exercises the full PCM dynamic range
    x = (rng.standard_normal((S, nf)).astype(np.float32) * 30000)
    b = np.asarray(f(x))
    for s in range(S):
        assert np.array_equal(ref(x[s]), b[s]), (nf, s)


def test_guard_is_required():
    """Canary: if this jaxlib stops contracting fma in fusions, the guard
    (and this test) can be retired; if it starts contracting through the
    guard, the encoder's byte-exactness silently degrades — fail loudly
    here instead."""
    rng = np.random.default_rng(0)
    a, b, c = (rng.standard_normal((4, 64)).astype(np.float32) * 1000 for _ in range(3))
    fused = jax.jit(lambda x, y, z: x + y * z)
    strict = jax.jit(lambda x, y, z, zero: x + (y * z + zero))
    strict_out = np.asarray(strict(a, b, c, np.float32(0.0)))
    assert np.array_equal(a + b * c, strict_out)
    if np.array_equal(a + b * c, np.asarray(fused(a, b, c))):
        pytest.skip("backend no longer contracts fma — guard now redundant")
