"""Bit-exact glibc exp2f, batched for the CPU-jitted encoder.

The reference encoder shapes the spectrum with exp2 of the interpolated
scale factors (spectral_noise_shaping.rs:254-270), and the oracle mirrors
it through glibc's exp2f via ctypes (ref/fp.py). XLA's exp2 differs from
glibc by 1-4 ulps on ~73% of inputs, which surfaces as knife-edge flips
in the quantizer and residual bits. This module reproduces glibc's exp2f
algorithm (sysdeps/ieee754/flt-32/e_exp2f.c: 32-entry f64 table + cubic
polynomial, all arithmetic in f64) so the batched encoder's shaping is
bit-identical to the oracle's.

The table and polynomial are not compile-time constants here: they are
EXTRACTED from the installed libm.so at import (the exact bytes the
ctypes oracle executes against), so the two can never drift apart. The
extraction scans libm's image for the exp2f_data layout — tab[32]
(starting with asuint64(1.0)), shift_scaled = 0x1.8p+47, poly[3] — and
verifies each tab entry sits within a few ulps of round(2^(i/32)). If
the scan fails (non-glibc libm), `available()` is False and callers fall
back to jnp.exp2 (byte-exactness tests would then see the pre-round-3
divergence rates).

The JAX formulation needs float64 (enabled locally while tracing via
jax.enable_x64) and guards every product that feeds an add
with an opaque zero, exactly like dsp/fftexact.py — the installed
exp2f binary was verified strict (non-fma) by fuzz, so contraction of
the polynomial would break parity. TPU has no f64: this path is for the
CPU backend; the TPU envelope is measured separately on hardware
(tools/tpu_parity.py).
"""

from __future__ import annotations

import ctypes.util
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

F32 = np.float32
F64 = np.float64
U64 = np.uint64


@lru_cache(maxsize=1)
def _extract() -> tuple[np.ndarray, float, np.ndarray] | None:
    """Locate (tab[32], shift_scaled, poly[3]) inside the system libm."""
    path = ctypes.util.find_library("m")
    if path is not None and "/" not in path:
        for prefix in ("/lib/x86_64-linux-gnu/", "/usr/lib/", "/lib/"):
            import os

            if os.path.exists(prefix + path):
                path = prefix + path
                break
    if path is None:
        return None
    try:
        data = open(path, "rb").read()
    except OSError:
        return None
    # expected neighbourhood: tab[i] ~ asuint64(2^(i/32)) - (i << 47)
    approx = [
        int((F64(2.0) ** (i / 32.0)).view(U64)) - (i << 47) for i in range(32)
    ]
    import struct

    anchor = struct.pack("<Q", 0x3FF0000000000000)
    start = 0
    while True:
        j = data.find(anchor, start)
        if j < 0:
            return None
        start = j + 1
        if j % 8 or j + 288 > len(data):
            continue
        cand = np.frombuffer(data[j : j + 256], dtype="<u8")
        if not all(abs(int(cand[i]) - approx[i]) < 16 for i in range(32)):
            continue
        shift = float(np.frombuffer(data[j + 256 : j + 264], dtype="<f8")[0])
        poly = np.frombuffer(data[j + 264 : j + 288], dtype="<f8").copy()
        if shift != float.fromhex("0x1.8p+47"):
            continue
        # sanity: poly ~ (ln2^3/6, ln2^2/2, ln2)
        ref = (0.0555041086648216, 0.240226506959101, 0.6931471805599453)
        if not all(abs(float(p) - r) < 1e-3 for p, r in zip(poly, ref)):
            continue
        return cand.copy(), shift, poly
    return None


def available() -> bool:
    return _extract() is not None


def exp2f_np(x: np.ndarray) -> np.ndarray:
    """Strict numpy mirror (fuzz-verified == glibc exp2f); |x| < 128."""
    tab, shift, poly = _extract()
    xd = x.astype(F64)
    kd = xd + shift
    ki = kd.view(U64)
    kd = kd - shift
    r = xd - kd
    with np.errstate(over="ignore"):  # uint64 wrap is the intended 2^k bias
        t = tab[(ki & U64(31)).astype(np.int64)] + (ki << U64(47))
    s = t.view(F64)
    z = poly[0] * r + poly[1]
    r2 = r * r
    y = poly[2] * r + F64(1.0)
    y = z * r2 + y
    y = y * s
    return y.astype(F32)


def exp2f_jax(x, zero32):
    """Batched bit-exact exp2f on an f32 array; |x| < 128 assumed (LC3
    scale factors span ~[-17, 17]). `zero32` is the runtime f32 zero used
    as the fma-contraction guard (see module docstring). Must be traced
    on a platform with real float64 (CPU)."""
    tab, shift, poly = _extract()
    with jax.enable_x64(True):
        zero = zero32.astype(jnp.float64).reshape(())
        g = lambda v: v + zero
        xd = x.astype(jnp.float64)
        # the magic-number rounding (x + 0x1.8p47 keeps only the 1/32-grid
        # part in the f64 mantissa) is exactly the kind of no-op-looking
        # float expression XLA's algebraic simplifier cancels — guard it
        kd = (xd + F64(shift)) + zero
        ki = jax.lax.bitcast_convert_type(kd, jnp.uint64)
        kd = kd - F64(shift)
        r = xd - kd
        t = jnp.asarray(tab)[(ki & U64(31)).astype(jnp.int32)] + (ki << U64(47))
        s = jax.lax.bitcast_convert_type(t, jnp.float64)
        z = g(F64(poly[0]) * r) + F64(poly[1])
        r2 = r * r
        y = g(F64(poly[2]) * r) + F64(1.0)
        y = g(z * r2) + y
        y = y * s
        return y.astype(jnp.float32)
