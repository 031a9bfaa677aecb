"""Pallas TPU kernel: fused TNS synthesis lattice.

The inverse TNS filter is an 8-tap IIR lattice over spectral lines
(decoder/temporal_noise_shaping.rs:24-74) — inherently sequential per
stream, so as plain XLA it runs as a ~ne-step lax.scan whose per-step
overhead dominates. This kernel keeps the whole recurrence inside one
Pallas program: streams ride the 128-wide lane axis, spectral position is
the sublane axis, and the 8 lattice taps are unrolled on [1, 128] rows held
in VMEM scratch. One grid step processes 128 streams.

Enabled via tns_synthesis_pallas (used when the array layout matches);
validated bit-compatibly against the lax.scan formulation in
tests/test_pallas_tns.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .params import DecoderParams

F32 = jnp.float32
LANES = 128


def _tns_kernel(ne: int, lanes: int, x_ref, rc_ref, bounds_ref, order_ref,
                out_ref, state):
    # state: [8, lanes] VMEM scratch. Wide lane blocks matter here: a [128]
    # f32 row fills 1/8 of a vreg, so running 512-1024 streams per block
    # amortizes the per-op issue latency of this ne-step serial loop ~4-8x.
    state[...] = jnp.zeros((8, lanes), F32)

    lo0 = bounds_ref[0, :]
    hi0 = bounds_ref[1, :]
    lo1 = bounds_ref[2, :]
    hi1 = bounds_ref[3, :]
    ord0 = order_ref[0, :]
    ord1 = order_ref[1, :]

    def body(n, _):
        xv = x_ref[n, :]
        in_f0 = (n >= lo0) & (n < hi0) & (ord0 > 0)
        in_f1 = (n >= lo1) & (n < hi1) & (ord1 > 0)
        active = in_f0 | in_f1
        order = jnp.where(in_f1, ord1, ord0)

        t = xv
        new_rows = []
        for kk in range(7, -1, -1):
            rc_k = jnp.where(in_f1, rc_ref[8 + kk, :], rc_ref[kk, :])
            s_k = state[kk, :]
            sub = kk < order
            t = jnp.where(sub, t - rc_k * s_k, t)
            if kk < 7:  # kk==7 can never satisfy kk < order-1 (order <= 8)
                upd = kk < order - 1
                new_rows.append((kk + 1, jnp.where(upd & active, rc_k * t + s_k,
                                                   state[kk + 1, :])))
        for row, val in new_rows:
            state[row, :] = val
        state[0, :] = jnp.where(active, t, state[0, :])
        out_ref[n, :] = jnp.where(active, t, xv)
        return 0

    jax.lax.fori_loop(0, ne, body, 0)


def _tns_enc_kernel(ne: int, lanes: int, x_ref, rc_ref, bounds_ref, order_ref,
                    out_ref, state):
    """Forward (analysis) lattice, encoder/temporal_noise_shaping.rs:76-110.

    Same layout as the synthesis kernel: streams on lanes, state [8, lanes]
    in VMEM scratch, taps unrolled.
    """
    state[...] = jnp.zeros((8, lanes), F32)

    lo0 = bounds_ref[0, :]
    hi0 = bounds_ref[1, :]
    lo1 = bounds_ref[2, :]
    hi1 = bounds_ref[3, :]
    ord0 = order_ref[0, :]
    ord1 = order_ref[1, :]
    lane8 = [jnp.full((lanes,), k, jnp.int32) for k in range(8)]

    def body(n, _):
        xv = x_ref[n, :]
        in_f0 = (n >= lo0) & (n < hi0) & (ord0 > 0)
        in_f1 = (n >= lo1) & (n < hi1) & (ord1 > 0)
        active = in_f0 | in_f1
        order = jnp.where(in_f1, ord1, ord0)

        t = xv
        st_save = t
        new_rows = {}
        for kk in range(7):
            rc_k = jnp.where(in_f1, rc_ref[8 + kk, :], rc_ref[kk, :])
            s_k = state[kk, :]
            m = kk < order - 1
            st_tmp = rc_k * t + s_k
            t = jnp.where(m, t + rc_k * s_k, t)
            new_rows[kk] = jnp.where(m & active, st_save, s_k)
            st_save = jnp.where(m, st_tmp, st_save)
        last = jnp.clip(order - 1, 0, 7)
        rc_last = jnp.zeros((lanes,), F32)
        st_last = jnp.zeros((lanes,), F32)
        for k in range(8):
            sel = last == lane8[k]
            rc_k = jnp.where(in_f1, rc_ref[8 + k, :], rc_ref[k, :])
            sk = new_rows[k] if k < 7 else state[7, :]
            rc_last = jnp.where(sel, rc_k, rc_last)
            st_last = jnp.where(sel, sk, st_last)
        t = jnp.where(active, t + rc_last * st_last, xv)
        for k in range(8):
            base = new_rows[k] if k < 7 else state[7, :]
            state[k, :] = jnp.where(active & (last == lane8[k]), st_save, base)
        out_ref[n, :] = t
        return 0

    jax.lax.fori_loop(0, ne, body, 0)


def _autocorr_kernel(ne: int, lanes: int, x_ref, sub_ref, out_ref):
    """All 54 (filter, sub-block, lag) autocorrelation sums in one pass.

    x rides [ne, lanes] in VMEM; each sum masks the window once and reduces
    lag products of static sublane slices (encoder/temporal_noise_shaping.rs
    :80-115 sums x[n]*x[n+k] over n in [lo, hi-k) — the masked array is zero
    outside [lo, hi), so the slice product hits exactly that index set)."""
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (ne, lanes), 0)
    xv = x_ref[...]
    for f in range(2):
        for sb in range(3):
            lo = sub_ref[f * 6 + sb * 2, :][None, :]
            hi = sub_ref[f * 6 + sb * 2 + 1, :][None, :]
            xm = jnp.where((iota_n >= lo) & (iota_n < hi), xv, 0.0)
            for k in range(9):
                prod = xm[: ne - k, :] * xm[k:, :]
                out_ref[f * 27 + sb * 9 + k, :] = jnp.sum(prod, axis=0)
    out_ref[54, :] = jnp.zeros((lanes,), F32)
    out_ref[55, :] = jnp.zeros((lanes,), F32)


def tns_autocorr_pallas(x, sub, interpret: bool = False):
    """x [S, ne] f32, sub [S, 2, 3, 2] int32 -> [S, 2, 3, 9] f32 lag sums.

    S must be a multiple of 128."""
    S, ne = x.shape
    assert S % LANES == 0, "pad the stream axis to a multiple of 128"
    lanes = LANES
    while lanes < 1024 and S % (lanes * 2) == 0 and ne * lanes * 2 * 4 < 2 ** 23:
        lanes *= 2
    sub_t = sub.reshape(S, 12).T.astype(jnp.int32)
    out = pl.pallas_call(
        partial(_autocorr_kernel, ne, lanes),
        out_shape=jax.ShapeDtypeStruct((56, S), F32),
        grid=(S // lanes,),
        in_specs=[
            pl.BlockSpec((ne, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((12, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((56, lanes), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x.T, sub_t)
    return out[:54].T.reshape(S, 2, 3, 9)


def tns_analysis_pallas(p, x, bounds, rc_order, num_filters, rc_q,
                        interpret: bool = False):
    """Drop-in for the analysis lattice scan in dsp.encoder.tns_analysis_batch.

    x [S, ne]; bounds [S,2,2]; rc_order [S,2]; num_filters [S]; rc_q [S,16].
    S must be a multiple of 128.
    """
    S, ne = x.shape
    assert S % LANES == 0, "pad the stream axis to a multiple of 128"
    lanes = LANES
    while lanes < 1024 and S % (lanes * 2) == 0 and ne * lanes * 2 * 2 * 4 < 2 ** 23:
        lanes *= 2
    bounds_t = bounds.reshape(S, 4).T.astype(jnp.int32)
    # fold the num_filters>1 gate into the second filter's order
    ord1 = jnp.where(num_filters > 1, rc_order[:, 1], 0)
    order_t = jnp.stack([rc_order[:, 0], ord1]).astype(jnp.int32)

    out_t = pl.pallas_call(
        partial(_tns_enc_kernel, ne, lanes),
        out_shape=jax.ShapeDtypeStruct((ne, S), F32),
        grid=(S // lanes,),
        in_specs=[
            pl.BlockSpec((ne, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ne, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, lanes), F32)],
        interpret=interpret,
    )(x.T, rc_q.T, bounds_t, order_t)
    return out_t.T


def tns_synthesis_pallas(p: DecoderParams, x, bandwidth, rc_order, rc_i,
                         interpret: bool = False):
    """Drop-in for dsp.decoder.tns_synthesis: x [S, ne] -> [S, ne].
    S must be a multiple of 128 (pad the stream batch if not)."""
    S, ne = x.shape
    assert S % LANES == 0, "pad the stream axis to a multiple of 128"
    sin_tab = np.sin(np.pi / 17.0 * (np.arange(17, dtype=np.float64) - 8.0)).astype(
        np.float32
    )
    sin_tab[0] = 0.0
    rc_q = jnp.asarray(sin_tab)[rc_i]  # [S, 16]
    bounds = jnp.asarray(p.tns_filter_bounds, jnp.int32)[bandwidth]  # [S,2,2]
    bounds_t = bounds.reshape(S, 4).T  # [4, S] rows: lo0,hi0,lo1,hi1
    order_t = rc_order.T.astype(jnp.int32)  # [2, S]

    xt = x.T  # [ne, S]
    lanes = LANES
    while lanes < 1024 and S % (lanes * 2) == 0 and ne * lanes * 2 * 2 * 4 < 2 ** 23:
        lanes *= 2
    out_t = pl.pallas_call(
        partial(_tns_kernel, ne, lanes),
        out_shape=jax.ShapeDtypeStruct((ne, S), F32),
        grid=(S // lanes,),
        in_specs=[
            pl.BlockSpec((ne, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ne, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, lanes), F32)],
        interpret=interpret,
    )(xt, rc_q.T, bounds_t, order_t)
    return out_t.T
