"""Batched bit-exact DCT-IV: the oracle's kissfft stages, vectorised.

The dense-matmul DCT-IV (params.dct_iv_matrix) accumulates in a different
order than the reference's kissfft recursion (common/kissfft.rs,
common/dct_iv.rs:49-67), so a small fraction of encoded frames land on the
other side of the spectral quantizer's +-0.375 knife edge
(encoder/spectral_quantization.rs:230-263) and diverge from the oracle by
+-1 on isolated lines. This module removes that gap at the source: it
evaluates the *same* butterfly decomposition as lc3jax/ref/fft.py — every
f32 multiply/add in the same order — but batched over streams and
vectorised over butterfly segments (per-element ops are independent, so
both vectorisations preserve each individual f32 rounding).

Structure per transform of length nfft = nf/2 (factors all in {2,3,4,5}
for LC3 sizes):
  1. leaf permutation  — the kissfft recursion's strided input gather is a
     mixed-radix digit reversal; applied as one static take (trace-time
     constant indices, lowered by XLA to a lane shuffle, no per-stream
     dynamic gather).
  2. butterfly stages, deepest first — at stage s with (p, m) the segments
     tile the array contiguously, every segment uses the same twiddle rows
     tw[fstride * j * arange(m)], so one reshape to [S, nseg, m] per branch
     vectorises the whole stage.
  3. DCT-IV pre/post twiddles and the even/odd re-interleave
     (dct_iv.rs:49-67) as elementwise ops + one static take.

Used by the batched encoder's forward MDCT (dsp/encoder.py) in place of
the split-precision matmul; validated bit-exactly against the oracle in
tests/test_fftexact.py and end-to-end by the encoder byte-exactness tests.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..ref.fft import _factorize

F32 = np.float32


def _leaf_permutation(nfft: int, factors: list[tuple[int, int]]) -> np.ndarray:
    """Input index for each leaf output position of the kissfft recursion."""
    perm = np.zeros(nfft, dtype=np.int64)

    def work(fstride: int, stage: int, fin_idx: int, fout_idx: int) -> None:
        p, m = factors[stage]
        if m == 1:
            perm[fout_idx : fout_idx + p] = fin_idx + fstride * np.arange(p)
            return
        end = fout_idx + p * m
        while fout_idx != end:
            work(fstride * p, stage + 1, fin_idx, fout_idx)
            fin_idx += fstride
            fout_idx += m

    work(1, 0, 0, 0)
    return perm


class BatchedFaithfulFFT:
    """Forward complex FFT on [S, nfft] rows, bit-identical per row to
    lc3jax.ref.fft.FaithfulFFT (and therefore to the reference's f32
    kissfft). Works on numpy or jax arrays (xp = np | jnp)."""

    def __init__(self, nfft: int):
        self.nfft = nfft
        phase = np.array([-2.0 * math.pi * i / nfft for i in range(nfft)])
        self.twr = np.cos(phase).astype(F32)
        self.twi = np.sin(phase).astype(F32)
        self.factors = _factorize(nfft)
        assert all(p in (2, 3, 4, 5) for p, _ in self.factors), (
            "generic-radix butterflies are not needed for LC3 sizes"
        )
        self.perm = _leaf_permutation(nfft, self.factors)
        # per-stage fstride: product of the radices above this stage
        self.fstrides = []
        fs = 1
        for p, _ in self.factors:
            self.fstrides.append(fs)
            fs *= p

    def _tw(self, step: int, m: int):
        idx = step * np.arange(m)
        return self.twr[idx], self.twi[idx]

    def __call__(self, fin_r, fin_i, xp=jnp, zero=None):
        """`zero` is an fma-contraction guard: a runtime-valued f32 scalar
        equal to 0.0 (NOT a trace-time constant, which XLA's algebraic
        simplifier would fold away). Every product that feeds an add or
        subtract is guarded as (a*b) + zero. Any contraction the emitter
        can still apply is harmless: fma(a, b, zero) rounds a*b + 0 once,
        which is bit-identical to round(a*b), so the strict two-rounding
        reference semantics survive either way — while the opaque add
        stops XLA from fusing the product into the *surrounding* add,
        which WOULD change the rounding. (A multiplicative one-guard does
        not work: the simplifier reassociates (x*const)*one to
        x*(const*one), re-exposing the product.) Sole caveat: an exact -0
        product may come out as +0; zero signs never reach encoded bytes
        (quantizer/energy/sign extraction are all zero-sign-blind).
        None = no guard (numpy, or callers that pre-verified their
        backend does not contract)."""
        g = (lambda v: v + zero) if zero is not None else (lambda v: v)
        self._g = g
        fr = xp.take(fin_r, self.perm, axis=1)
        fi = xp.take(fin_i, self.perm, axis=1)
        S = fr.shape[0]
        for s in range(len(self.factors) - 1, -1, -1):
            p, m = self.factors[s]
            fstride = self.fstrides[s]
            nseg = self.nfft // (p * m)
            # branch j of every segment, shape [S, nseg, m]
            br = [fr.reshape(S, nseg, p, m)[:, :, j, :] for j in range(p)]
            bi = [fi.reshape(S, nseg, p, m)[:, :, j, :] for j in range(p)]
            if p == 2:
                out = self._bfly2(br, bi, fstride, m, xp)
            elif p == 3:
                out = self._bfly3(br, bi, fstride, m, xp)
            elif p == 4:
                out = self._bfly4(br, bi, fstride, m, xp)
            else:
                out = self._bfly5(br, bi, fstride, m, xp)
            outr, outi = out
            fr = xp.stack(outr, axis=2).reshape(S, self.nfft)
            fi = xp.stack(outi, axis=2).reshape(S, self.nfft)
        return fr, fi

    # Each bfly mirrors the same-named method of ref.fft.FaithfulFFT op by
    # op (functional form: no in-place aliasing, same evaluation order).

    def _bfly2(self, fr, fi, fstride, m, xp):
        g = self._g
        twr, twi = self._tw(fstride, m)
        tr = g(fr[1] * twr) - g(fi[1] * twi)
        ti = g(fr[1] * twi) + g(fi[1] * twr)
        return ([fr[0] + tr, fr[0] - tr], [fi[0] + ti, fi[0] - ti])

    def _bfly4(self, fr, fi, fstride, m, xp):
        g = self._g
        t1r, t1i = self._tw(fstride, m)
        t2r, t2i = self._tw(fstride * 2, m)
        t3r, t3i = self._tw(fstride * 3, m)
        s0r = g(fr[1] * t1r) - g(fi[1] * t1i)
        s0i = g(fr[1] * t1i) + g(fi[1] * t1r)
        s1r = g(fr[2] * t2r) - g(fi[2] * t2i)
        s1i = g(fr[2] * t2i) + g(fi[2] * t2r)
        s2r = g(fr[3] * t3r) - g(fi[3] * t3i)
        s2i = g(fr[3] * t3i) + g(fi[3] * t3r)
        s5r = fr[0] - s1r
        s5i = fi[0] - s1i
        f0r = fr[0] + s1r
        f0i = fi[0] + s1i
        s3r = s0r + s2r
        s3i = s0i + s2i
        s4r = s0r - s2r
        s4i = s0i - s2i
        f2r = f0r - s3r
        f2i = f0i - s3i
        f0r = f0r + s3r
        f0i = f0i + s3i
        # forward-transform branch of kissfft.rs:169-170
        f1r = s5r + s4i
        f1i = s5i - s4r
        f3r = s5r - s4i
        f3i = s5i + s4r
        return ([f0r, f1r, f2r, f3r], [f0i, f1i, f2i, f3i])

    def _bfly3(self, fr, fi, fstride, m, xp):
        g = self._g
        epi3_i = self.twi[fstride * m]
        t1r, t1i = self._tw(fstride, m)
        t2r, t2i = self._tw(fstride * 2, m)
        s1r = g(fr[1] * t1r) - g(fi[1] * t1i)
        s1i = g(fr[1] * t1i) + g(fi[1] * t1r)
        s2r = g(fr[2] * t2r) - g(fi[2] * t2i)
        s2i = g(fr[2] * t2i) + g(fi[2] * t2r)
        s3r = s1r + s2r
        s3i = s1i + s2i
        s0r = s1r - s2r
        s0i = s1i - s2i
        # *0.5 is exact (power of two), so contraction of this product is
        # harmless and it needs no guard
        fmr = fr[0] - s3r * F32(0.5)
        fmi = fi[0] - s3i * F32(0.5)
        s0r = g(s0r * epi3_i)
        s0i = g(s0i * epi3_i)
        f0r = fr[0] + s3r
        f0i = fi[0] + s3i
        f2r = fmr + s0i
        f2i = fmi - s0r
        f1r = fmr - s0i
        f1i = fmi + s0r
        return ([f0r, f1r, f2r], [f0i, f1i, f2i])

    def _bfly5(self, fr, fi, fstride, m, xp):
        ya_r, ya_i = self.twr[fstride * m], self.twi[fstride * m]
        yb_r, yb_i = self.twr[fstride * 2 * m], self.twi[fstride * 2 * m]
        t1r, t1i = self._tw(fstride, m)
        t2r, t2i = self._tw(fstride * 2, m)
        t3r, t3i = self._tw(fstride * 3, m)
        t4r, t4i = self._tw(fstride * 4, m)
        g = self._g
        s0r, s0i = fr[0], fi[0]
        s1r = g(fr[1] * t1r) - g(fi[1] * t1i)
        s1i = g(fr[1] * t1i) + g(fi[1] * t1r)
        s2r = g(fr[2] * t2r) - g(fi[2] * t2i)
        s2i = g(fr[2] * t2i) + g(fi[2] * t2r)
        s3r = g(fr[3] * t3r) - g(fi[3] * t3i)
        s3i = g(fr[3] * t3i) + g(fi[3] * t3r)
        s4r = g(fr[4] * t4r) - g(fi[4] * t4i)
        s4i = g(fr[4] * t4i) + g(fi[4] * t4r)
        s7r, s7i = s1r + s4r, s1i + s4i
        s10r, s10i = s1r - s4r, s1i - s4i
        s8r, s8i = s2r + s3r, s2i + s3i
        s9r, s9i = s2r - s3r, s2i - s3i
        f0r = fr[0] + (s7r + s8r)
        f0i = fi[0] + (s7i + s8i)
        s5r = s0r + g(s7r * ya_r) + g(s8r * yb_r)
        s5i = s0i + g(s7i * ya_r) + g(s8i * yb_r)
        s6r = g(s10i * ya_i) + g(s9i * yb_i)
        s6i = -g(s10r * ya_i) - g(s9r * yb_i)
        f1r = s5r - s6r
        f1i = s5i - s6i
        f4r = s5r + s6r
        f4i = s5i + s6i
        s11r = s0r + g(s7r * yb_r) + g(s8r * ya_r)
        s11i = s0i + g(s7i * yb_r) + g(s8i * ya_r)
        s12r = -g(s10i * yb_i) + g(s9i * ya_i)
        s12i = g(s10r * yb_i) - g(s9r * ya_i)
        f2r = s11r + s12r
        f2i = s11i + s12i
        f3r = s11r - s12r
        f3i = s11i - s12i
        return ([f0r, f1r, f2r, f3r, f4r], [f0i, f1i, f2i, f3i, f4i])


class BatchedFaithfulDctIV:
    """DCT-IV on [S, nf] rows, bit-identical per row to
    lc3jax.ref.fft.FaithfulDctIV (dct_iv.rs:49-67)."""

    def __init__(self, nf: int):
        self.nf = nf
        count = nf // 2
        self.fft = BatchedFaithfulFFT(count)
        temp = np.array(
            [-math.pi * (8 * i + 1) / (8.0 * count * 2.0) for i in range(count)]
        )
        self.twr = np.cos(temp).astype(F32)
        self.twi = np.sin(temp).astype(F32)
        # res[0::2] = even path, res[nf-1::-2] = odd path (reversed):
        # inverse permutation applied as one static take
        inv = np.zeros(nf, dtype=np.int64)
        inv[np.arange(0, nf, 2)] = np.arange(count)
        inv[np.arange(nf - 1, -1, -2)] = count + np.arange(count)
        self.out_perm = inv

    def __call__(self, buf, xp=jnp, zero=None):
        g = (lambda v: v + zero) if zero is not None else (lambda v: v)
        nf = self.nf
        be = buf[:, 0::2]
        bo = buf[:, nf - 1 :: -2]
        in_r = g(self.twr * be) - g(self.twi * bo)
        in_i = g(self.twr * bo) + g(self.twi * be)
        out_r, out_i = self.fft(in_r, in_i, xp=xp, zero=zero)
        cr = g(self.twr * out_r) - g(self.twi * out_i)
        ci = g(self.twr * out_i) + g(self.twi * out_r)
        halves = xp.concatenate([cr * F32(2.0), -(ci * F32(2.0))], axis=1)
        return xp.take(halves, self.out_perm, axis=1)


@lru_cache(maxsize=None)
def batched_dct_iv(nf: int) -> BatchedFaithfulDctIV:
    return BatchedFaithfulDctIV(nf)
