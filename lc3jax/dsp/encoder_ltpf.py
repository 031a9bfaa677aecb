"""Batched LTPF pitch analysis (reference encoder/long_term_post_filter.rs).

The encoder's hottest stage (lc3_encoder.rs:89) recast TPU-first:
- 12.8 kHz polyphase resampler: a static sparse tap pattern baked into a
  dense [x_ext, len12p8] matrix -> one MXU matmul per frame
- 50 Hz biquad: short lax.scan (len12p8 steps) over [S] lanes
- 6.4 kHz downsample: 5-tap conv as stacked shifts
- lag search: [S, 98] autocorrelations via einsum over gathered windows
- 12.8 kHz refinement + fractional interpolation: dynamic-window gathers
- normalized-correlation activation with hysteresis state
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables as T
from ..config import FrameDuration, Lc3Config
from .gatherfree import funnel_rows

F32 = jnp.float32

NMEM = 232
K_MIN, K_MAX = 17, 114
HIGHEST = jax.lax.Precision.HIGHEST


@lru_cache(maxsize=None)
def _ltpf_enc_consts(cfg: Lc3Config):
    if cfg.n_ms == FrameDuration.MS10:
        len12, len64, delay = 128, 64, 24
    else:
        len12, len64, delay = 96, 48, 44
    up = {8000: 24, 16000: 12, 24000: 8, 32000: 6, 44100: 4, 48000: 4}[cfg.fs]
    resamp = 0.5 if cfg.fs == 8000 else 1.0
    ext_len = 240 // up + cfg.nf
    # dense resampler matrix [ext_len, len12]
    mat = np.zeros((ext_len, len12), dtype=np.float32)
    for n in range(len12):
        for k in range(-120 // up, 120 // up + 1):
            idx = (15 * n) // up + k - 120 // up
            ih = up * k - ((15 * n) % up)
            if -120 < ih < 120:
                mat[240 // up + idx, n] += T.TAB_RESAMP_FILTER[119 + ih]
    mat *= up * resamp
    return len12, len64, delay, up, ext_len, mat


@jax.tree_util.register_dataclass
@dataclass
class LtpfEncState:
    x_ext: jax.Array  # f32 [S, ext_len] input history at fs
    x12: jax.Array  # f32 [S, len12 + delay + NMEM]
    x64: jax.Array  # f32 [S, 64 + K_MAX]
    h50_m1: jax.Array  # [S]
    h50_m2: jax.Array  # [S]
    t_prev: jax.Array  # int32 [S]
    mem_pitch: jax.Array  # f32 [S]
    mem_active: jax.Array  # bool [S]
    mem_nc: jax.Array  # f32 [S]
    mem_mem_nc: jax.Array  # f32 [S]


def ltpf_enc_init(cfg: Lc3Config, n_streams: int) -> LtpfEncState:
    len12, len64, delay, up, ext_len, _ = _ltpf_enc_consts(cfg)
    return LtpfEncState(
        x_ext=jnp.zeros((n_streams, ext_len), F32),
        x12=jnp.zeros((n_streams, len12 + delay + NMEM), F32),
        x64=jnp.zeros((n_streams, 64 + K_MAX), F32),
        h50_m1=jnp.zeros((n_streams,), F32),
        h50_m2=jnp.zeros((n_streams,), F32),
        t_prev=jnp.full((n_streams,), K_MIN, jnp.int32),
        mem_pitch=jnp.zeros((n_streams,), F32),
        mem_active=jnp.zeros((n_streams,), bool),
        mem_nc=jnp.zeros((n_streams,), F32),
        mem_mem_nc=jnp.zeros((n_streams,), F32),
    )


def _biquad_50hz(x12_new, h50_m1, h50_m2):
    """50 Hz high-pass IIR over the len12 new samples (scan over time)."""
    a1, a2 = F32(-1.9652933726226904), F32(0.9658854605688177)
    b0, b1, b2 = F32(0.9827947082978771), F32(-1.965589416595754), F32(0.9827947082978771)

    def step(carry, xn):
        m1, m2 = carry
        h = xn - a1 * m1 - a2 * m2
        y = b0 * h + b1 * m1 + b2 * m2
        return (h, m1), y

    # len12 <= 128 steps of ~4 flops each: unrolled, the XLA loop overhead
    # (which dominated this stage's device time) disappears. (A Python loop
    # + jnp.stack was A/B'd on-chip: identical step time, so the scan stays.)
    (m1, m2), ys = jax.lax.scan(step, (h50_m1, h50_m2), x12_new.T,
                                unroll=True)
    return ys.T, m1, m2


def ltpf_analysis(cfg: Lc3Config, st: LtpfEncState, x_s, near_nyquist, nbits: int):
    """Returns (fields dict, new state). x_s int16 [S, nf]."""
    len12, len64, delay, up, ext_len, mat = _ltpf_enc_consts(cfg)
    S = x_s.shape[0]

    if cfg.n_ms == FrameDuration.MS7P5:
        t_nbits = int(np.floor(nbits * 10.0 / 7.5 + 0.5))
    else:
        t_nbits = nbits
    gain_ltpf_on = t_nbits < 560 + cfg.fs_ind * 80

    # shift histories
    num = 240 // up
    x_ext = jnp.concatenate([st.x_ext[:, -num:], x_s.astype(F32)], axis=1)
    x12_hist = st.x12[:, len12:]

    # resample to 12.8k: MXU matmul
    x12_new = jnp.einsum(
        "se,en->sn", x_ext, jnp.asarray(mat),
        preferred_element_type=F32, precision=HIGHEST,
    )
    x12_new, m1, m2 = _biquad_50hz(x12_new, st.h50_m1, st.h50_m2)
    x12 = jnp.concatenate([x12_hist, x12_new], axis=1)  # [S, NMEM+delay+len12]

    # 6.4 kHz downsample (5-tap window, stride 2) over the newest len64 samples
    c5 = jnp.asarray(
        [0.1236796411180537, 0.2353512128364889, 0.2819382920909148,
         0.2353512128364889, 0.1236796411180537], F32,
    )
    base = NMEM - 3
    x64_new = sum(
        c5[j] * x12[:, base + j : base + j + 2 * len64 : 2] for j in range(5)
    )
    # buffer layout mirrors the oracle's shift+write exactly: history shifts
    # left by len64 and the new frame lands at [K_MAX, K_MAX+len64) — NOT at
    # the buffer end. At 10 ms (len64=64) the two coincide; at 7.5 ms
    # (len64=48) the buffer keeps a never-read 16-zero tail and appending at
    # the end instead would shift every autocorrelation window 16 samples
    # stale (ltpf_enc.py:83-144; the round-5 corpus caught this as a 64/200
    # byte divergence at 44.1 k/7.5 ms).
    x64 = jnp.concatenate(
        [st.x64[:, len64 : len64 + K_MAX], x64_new,
         st.x64[:, K_MAX + len64 :]],
        axis=1,
    )  # [S, 64+K_MAX]

    # autocorrelation over lags 17..114
    nlags = K_MAX + 1 - K_MIN
    cur = x64[:, K_MAX : K_MAX + len64]
    lag_wins = jnp.stack(
        [x64[:, K_MAX - K_MIN - k : K_MAX - K_MIN - k + len64] for k in range(nlags)],
        axis=1,
    )  # [S, 98, len64]
    r = jnp.einsum("skn,sn->sk", lag_wins, cur, preferred_element_type=F32,
                   precision=HIGHEST)
    weight = F32(1.0) - F32(0.5) * jnp.arange(nlags, dtype=F32) / F32(K_MAX - K_MIN)
    rw = weight[None, :] * r

    lag_t1 = jnp.argmax(rw, axis=1) + K_MIN
    k_from = jnp.maximum(K_MIN, st.t_prev - 4) - K_MIN
    k_to = jnp.minimum(K_MAX, st.t_prev + 4) - K_MIN + 1
    in_win = (jnp.arange(nlags)[None, :] >= k_from[:, None]) & (
        jnp.arange(nlags)[None, :] < k_to[:, None]
    )
    lag_t2 = jnp.argmax(jnp.where(in_win, r, -jnp.inf), axis=1) + K_MIN

    # per-stream scalar picks as masked sums (TPU gathers serialize)
    wins = jnp.stack(
        [x64[:, K_MAX - d : K_MAX - d + len64] for d in range(K_MAX + 1)], axis=1
    )
    v_all = jnp.sum(wins * wins, axis=2)  # [S, K_MAX+1]

    def normvalue(lag):
        sel = lag[:, None] == jnp.arange(K_MAX + 1)[None, :]
        return jnp.sum(jnp.where(sel, v_all, 0.0), axis=1)

    nv0 = normvalue(jnp.zeros(S, jnp.int32))
    nv1 = normvalue(lag_t1)

    def r_at(lag):
        sel = (lag - K_MIN)[:, None] == jnp.arange(nlags)[None, :]
        return jnp.sum(jnp.where(sel, r, 0.0), axis=1)
    nc1 = jnp.maximum(F32(0.0), r_at(lag_t1) / jnp.sqrt(nv0 * nv1))
    nv2 = normvalue(lag_t2)
    nc2_raw = jnp.maximum(F32(0.0), r_at(lag_t2) / jnp.sqrt(nv0 * nv2))
    nc2 = jnp.where(lag_t1 == lag_t2, nc1, nc2_raw)
    nc1 = jnp.nan_to_num(nc1)
    nc2 = jnp.nan_to_num(nc2)

    take2 = nc2 > F32(0.85) * nc1
    t_current = jnp.where(take2, lag_t2, lag_t1)
    pitch_present = jnp.where(take2, nc2 > F32(0.6), nc1 > F32(0.6))

    # ---- pitch refinement at 12.8 kHz
    k_min2 = jnp.maximum(32, 2 * t_current - 4)
    k_max2 = jnp.minimum(228, 2 * t_current + 4)
    cur12 = x12[:, NMEM : NMEM + len12]
    # r12 for k in [k_min2-4, k_max2+4]: 17 consecutive lags, so the 17
    # windows x12[NMEM - k : NMEM - k + len12] live in one contiguous span
    # of width len12+16 at a per-stream offset — one funnel extract plus
    # static shifts, no gather. Left-pad by 4 so the offset never clamps
    # (kvals > 228 can reach index -4; those lags are masked invalid below).
    koffs = jnp.arange(17)
    kvals = (k_min2 - 4)[:, None] + koffs[None, :]  # [S,17]
    x12p = jnp.pad(x12, ((0, 0), (4, 0)))
    woff = NMEM + 4 - k_min2 - 12  # offset of the span start in x12p
    w12 = funnel_rows(x12p, woff, len12 + 16)
    wins12 = jnp.stack(
        [jax.lax.slice_in_dim(w12, 16 - k, 16 - k + len12, axis=1) for k in range(17)],
        axis=1,
    )  # wins12[s,k,n] = x12[NMEM - (k_min2-4+k) + n]
    r12 = jnp.einsum("skn,sn->sk", wins12, cur12, preferred_element_type=F32,
                     precision=HIGHEST)
    valid_k = (kvals >= k_min2[:, None]) & (kvals <= k_max2[:, None])
    best_rel = jnp.argmax(jnp.where(valid_k, r12, -jnp.inf), axis=1)
    pitch_int = (k_min2 - 4) + best_rel

    # fractional refinement via TAB_LTPF_INTERP_R; pre-select the 9 r12
    # values around best_rel via masked sums (no per-stream gathers)
    interp_tab = jnp.asarray(T.TAB_LTPF_INTERP_R)
    lane17 = jnp.arange(17)[None, :]
    r12_at = {
        m: jnp.sum(
            jnp.where(jnp.clip(best_rel + m, 0, 16)[:, None] == lane17, r12, 0.0),
            axis=1,
        )
        for m in range(-4, 5)
    }

    def interp_at(d):  # d in -3..3
        total = jnp.zeros(S, F32)
        for m in range(-4, 5):
            nidx = 4 * m - d
            if -16 < nidx < 16:
                total = total + r12_at[m] * interp_tab[nidx + 15]
        return total

    interp_vals = jnp.stack([interp_at(d) for d in range(-3, 4)], axis=1)  # [S,7] d=-3..3
    dgrid = jnp.arange(-3, 4)
    case_32 = pitch_int == 32
    case_mid = (pitch_int > 32) & (pitch_int < 127)
    case_hi = (pitch_int >= 127) & (pitch_int < 157)
    allow = jnp.zeros((S, 7), bool)
    allow = jnp.where(case_32[:, None], dgrid[None, :] >= 0, allow)
    allow = jnp.where(case_mid[:, None], True, allow)
    allow = jnp.where(case_hi[:, None], (dgrid[None, :] % 2 == 0), allow)
    masked = jnp.where(allow, interp_vals, -jnp.inf)
    # reference keeps d=0 unless a strictly larger value appears, scanning
    # d in ascending order with strict >; emulate: start best=0 at d "none"
    best_val = jnp.full(S, 0.0, F32)
    pitch_fr = jnp.zeros(S, jnp.int32)
    for j in range(7):
        v = masked[:, j]
        better = v > best_val
        best_val = jnp.where(better, v, best_val)
        pitch_fr = jnp.where(better, dgrid[j], pitch_fr)

    neg = pitch_fr < 0
    pitch_int = jnp.where(neg, pitch_int - 1, pitch_int)
    pitch_fr = jnp.where(neg, pitch_fr + 4, pitch_fr)

    pitch_index = jnp.where(
        pitch_int < 127,
        4 * pitch_int + pitch_fr - 128,
        jnp.where(pitch_int < 157, 2 * pitch_int + pitch_fr // 2 - 126, pitch_int + 283),
    )

    # ---- activation bit
    # x(i)(n,d) = sum_k x12[NMEM + off + n - k] * h[4k - d + 7], k=-2..2.
    # no_delay has stream-invariant indices (static slices); shifted reads a
    # contiguous window at per-stream offset NMEM - pitch_int (one funnel),
    # and its per-stream taps h[4k - pitch_fr + 7] are a 4-way select on
    # pitch_fr in [0,3]. Same k order and 0-taps as the reference walk, so
    # the f32 sums are bit-identical.
    h_np = np.asarray(T.TAB_LTPF_INTERP_X12K8, np.float32)  # [15]

    def h_at(hidx: int) -> float:
        return float(h_np[hidx + 7]) if -8 < hidx < 8 else 0.0

    no_delay = jnp.zeros((S, len12), F32)
    for k in range(-2, 3):
        no_delay = no_delay + x12[:, NMEM - k : NMEM - k + len12] * F32(h_at(4 * k))

    wsh = funnel_rows(x12, NMEM - pitch_int - 2, len12 + 4)  # [S, len12+4]
    shifted = jnp.zeros((S, len12), F32)
    for k in range(-2, 3):
        tap = jnp.zeros(S, F32)
        for dd in range(4):
            tap = jnp.where(pitch_fr == dd, F32(h_at(4 * k - dd)), tap)
        vals = jax.lax.slice_in_dim(wsh, 2 - k, 2 - k + len12, axis=1)
        shifted = shifted + vals * tap[:, None]
    nc_num = jnp.sum(no_delay * shifted, axis=1)
    denom = jnp.sqrt(jnp.sum(no_delay * no_delay, axis=1) * jnp.sum(shifted * shifted, axis=1))
    nc = jnp.where(denom > 0.0, nc_num / denom, 0.0)
    pitch = pitch_int.astype(F32) + pitch_fr.astype(F32) / F32(4.0)

    cond_start = (
        ~st.mem_active
        & ((cfg.n_ms == FrameDuration.MS10) | (st.mem_mem_nc > F32(0.94)))
        & (st.mem_nc > F32(0.94))
        & (nc > F32(0.94))
    )
    cond_hold = st.mem_active & (nc > F32(0.9))
    cond_near = (
        st.mem_active
        & (jnp.abs(pitch - st.mem_pitch) < F32(2.0))
        & ((nc - st.mem_nc) > F32(-0.1))
        & (nc > F32(0.84))
    )
    ltpf_active = (cond_start | cond_hold | cond_near) & gain_ltpf_on & ~near_nyquist

    pitch_index = jnp.where(pitch_present, pitch_index, 0)
    nc_out = jnp.where(pitch_present, nc, 0.0)

    new_state = LtpfEncState(
        x_ext=x_ext,
        x12=x12[:, x12.shape[1] - (len12 + delay + NMEM) :],
        x64=x64,
        h50_m1=m1,
        h50_m2=m2,
        t_prev=t_current.astype(jnp.int32),
        mem_pitch=jnp.where(pitch_present, pitch, 0.0),
        mem_active=jnp.where(pitch_present, ltpf_active, False),
        mem_nc=nc_out,
        mem_mem_nc=st.mem_nc,
    )
    fields = dict(
        pitch_index=pitch_index.astype(jnp.int32),
        pitch_present=pitch_present,
        ltpf_active=ltpf_active & pitch_present,
        nbits_ltpf=jnp.where(pitch_present, 11, 1).astype(jnp.int32),
    )
    return fields, new_state
