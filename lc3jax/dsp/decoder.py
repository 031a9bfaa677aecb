"""Batched TPU decoder: spectral chain + IMDCT + LTPF + output scaling.

One jitted program per (Lc3Config, frame_nbits). All arrays carry a leading
stream axis [S]. The bit-serial stages (side info + range decoding, MPVQ
de-enumeration) run in the bitstream layer (lc3jax/coding); everything from
integer spectral lines to PCM runs here as fused XLA ops:

- residual refinement / noise filling / PLC: vectorised with closed-form LCG
  jump tables (no scan on the hot path)
- TNS synthesis: lax.scan over spectral lines, 8-tap lattice unrolled,
  vmapped over streams
- SNS synthesis: gathers + [S,16]x[16,16] matmul + exp2
- IMDCT: dense [S,nf]x[nf,nf] DCT-IV matmul on the MXU + fold/window/OLA
- LTPF: blocked scan (see ltpf.py)

Reference parity: decoder/lc3_decoder.rs:73-154 stage order.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables as T
from ..config import Lc3Config
from .ltpf import LtpfState, ltpf_init, ltpf_run
from .params import DecoderParams, decoder_params

F32 = jnp.float32

# Stream-axis chunk width for the LTPF at large batch: the lax.scan LTPF's
# per-block slabs spill VMEM beyond ~4096 streams, so decode_step runs it in
# chunks of this width (module constant so tests can exercise the chunked
# path at CPU-sized batches).
_LTPF_CHUNK = 4096


@jax.tree_util.register_dataclass
@dataclass
class ParsedFrames:
    """Host-parsed frame fields, batched over streams [S]."""

    x_int: jax.Array  # int32 [S, ne] quantized lines (post residual in lsb mode)
    lsb_mode: jax.Array  # bool [S]
    gg_ind: jax.Array  # int32 [S]
    rc_order: jax.Array  # int32 [S, 2]
    rc_i: jax.Array  # int32 [S, 16]
    bandwidth: jax.Array  # int32 [S]
    noise_factor: jax.Array  # int32 [S]
    nf_seed: jax.Array  # int32 [S]
    zero_frame: jax.Array  # bool [S]
    residual_bits: jax.Array  # bool [S, ne], aligned at each nonzero line
    n_residual: jax.Array  # int32 [S]
    sns_y: jax.Array  # int32 [S, 16] MPVQ de-enumerated pulses
    sns_shape: jax.Array  # int32 [S]
    sns_gind: jax.Array  # int32 [S]
    sns_ind_lf: jax.Array  # int32 [S]
    sns_ind_hf: jax.Array  # int32 [S]
    ltpf_active: jax.Array  # bool [S]
    pitch_index: jax.Array  # int32 [S]
    bad_frame: jax.Array  # bool [S]


@jax.tree_util.register_dataclass
@dataclass
class DecoderState:
    mem_ola: jax.Array  # f32 [S, nf - z]
    plc_spec: jax.Array  # f32 [S, ne]
    plc_alpha: jax.Array  # f32 [S]
    plc_seed: jax.Array  # int32 [S]
    plc_lost: jax.Array  # int32 [S]
    ltpf: LtpfState


def decoder_init(cfg: Lc3Config, n_streams: int) -> DecoderState:
    p = decoder_params(cfg)
    return DecoderState(
        mem_ola=jnp.zeros((n_streams, cfg.nf - cfg.z), F32),
        plc_spec=jnp.zeros((n_streams, cfg.ne), F32),
        plc_alpha=jnp.ones((n_streams,), F32),
        plc_seed=jnp.full((n_streams,), 24607, jnp.int32),
        plc_lost=jnp.zeros((n_streams,), jnp.int32),
        ltpf=ltpf_init(p, n_streams),
    )


# --------------------------------------------------------------- stages


def residual_apply(p: DecoderParams, x, x_int, residual_bits, n_residual, lsb_mode):
    """+-0.3125 / -+0.1875 refinement for non-lsb mode (residual_spectrum.rs)."""
    nonzero = x_int != 0
    bit_pos = jnp.cumsum(nonzero, axis=1) - 1
    # residual_bits is spectrally aligned by the parsers (host.py, native.cc,
    # device.py), so no per-element gather is needed here — TPU gathers run
    # at ~20 ns/element and dominated the step before this layout change
    bit = residual_bits
    apply = nonzero & (bit_pos < n_residual[:, None]) & ~lsb_mode[:, None]
    pos = x > 0.0
    up = jnp.where(pos, F32(0.3125), F32(0.1875))
    down = jnp.where(pos, F32(-0.1875), F32(-0.3125))
    return jnp.where(apply, x + jnp.where(bit, up, down), x)


def noise_fill(p: DecoderParams, x, x_int, seed, bandwidth, noise_factor, zero_frame):
    """LCG noise fill of all-zero neighbourhoods (noise_filling.rs:18-56)."""
    ne = p.ne
    k = jnp.arange(ne)
    bw_stop = jnp.asarray(p.bw_stop, jnp.int32)[bandwidth][:, None]  # [S,1]
    # zero-indicator with positions >= bw_stop treated as zero (window clamp)
    zero = (x_int == 0) | (k[None, :] >= bw_stop)
    window_all_zero = jnp.ones_like(zero)
    for d in range(-p.nf_width, p.nf_width + 1):
        shifted = jnp.roll(zero, -d, axis=1)
        # out-of-array below k-nf_width can't happen (k >= nf_start > width);
        # above, k+d >= bw_stop is excluded by the clamp built into `zero`
        valid = (k[None, :] + d >= 0) & (k[None, :] + d < ne)
        window_all_zero &= jnp.where(valid & (k[None, :] + d < bw_stop), shifted, True)
    in_range = (k[None, :] >= p.nf_start) & (k[None, :] < bw_stop)
    fill = window_all_zero & in_range & ~zero_frame[:, None]

    count = jnp.cumsum(fill, axis=1)  # inclusive: m-th fill uses m LCG steps
    # m-step LCG jump via binary decomposition of m: 9 elementwise rounds,
    # no per-element gathers (TPU gathers across lanes are slow)
    cur = count.astype(jnp.uint32)
    seeds = seed[:, None].astype(jnp.uint32)
    offs = jnp.zeros(count.shape, jnp.uint32)
    mult = jnp.ones(count.shape, jnp.uint32)
    a_pow, b_pow = 31821, 13849  # (A, B) of a 2^b-step jump, mod 2^16
    for b in range(9):  # count <= ne <= 400 < 2^9
        bit = (cur >> b) & 1
        mult_new = (mult * jnp.uint32(a_pow)) & 0xFFFF
        offs_new = (offs * jnp.uint32(a_pow) + jnp.uint32(b_pow)) & 0xFFFF
        mult = jnp.where(bit == 1, mult_new, mult)
        offs = jnp.where(bit == 1, offs_new, offs)
        b_pow = (b_pow * (a_pow + 1)) & 0xFFFF
        a_pow = (a_pow * a_pow) & 0xFFFF
    seeds = (mult * seeds + offs) & 0xFFFF
    level = (F32(8.0) - noise_factor.astype(F32)) / F32(16.0)
    value = jnp.where(seeds < 0x8000, level[:, None], -level[:, None])
    return jnp.where(fill, value, x)


def global_gain(p: DecoderParams, x, gg_ind, nbits: int):
    # gg_ind has 256 possible values and gg_off is static: bake an exact
    # 10^((i+off)/28) table at trace time instead of a device pow (TPU pow
    # is an approximation; a gather is both exact and faster)
    from ..ref import fp as _fp

    fs = p.cfg.fs_ind + 1
    gg_off = -min(nbits // (10 * fs), 115) - 105 - 5 * fs
    table = np.array(
        [
            _fp.powf(
                np.float32(10.0),
                np.float32(np.float32(i) + np.float32(gg_off)) / np.float32(28.0),
            )
            for i in range(256)
        ],
        dtype=np.float32,
    )
    gg = jnp.asarray(table)[gg_ind]
    return x * gg[:, None]


def tns_synthesis(p: DecoderParams, x, bandwidth, rc_order, rc_i):
    """Inverse TNS lattice: scan over lines, vmapped over streams."""
    bounds = jnp.asarray(p.tns_filter_bounds, jnp.int32)[bandwidth]  # [S,2,2]
    # 17-entry exact sin table; index 0 maps to 0.0 (rc_i==0 sentinel,
    # decoder/temporal_noise_shaping.rs:42-46)
    sin_tab = np.sin(np.pi / 17.0 * (np.arange(17, dtype=np.float64) - 8.0)).astype(
        np.float32
    )
    sin_tab[0] = 0.0
    rc_q = jnp.asarray(sin_tab)[rc_i]  # [S,16]

    S = x.shape[0]
    ne = p.ne

    def step(carry, xs):
        state = carry  # [S, 8]
        x_n, n = xs
        in_f0 = (n >= bounds[:, 0, 0]) & (n < bounds[:, 0, 1]) & (rc_order[:, 0] > 0)
        in_f1 = (n >= bounds[:, 1, 0]) & (n < bounds[:, 1, 1]) & (rc_order[:, 1] > 0)
        active = in_f0 | in_f1
        f1 = in_f1
        order = jnp.where(f1, rc_order[:, 1], rc_order[:, 0])
        rc = jnp.where(f1[:, None], rc_q[:, 8:16], rc_q[:, 0:8])  # [S,8]

        t = x_n
        new_state = state
        for kk in range(7, -1, -1):
            sub = kk < order
            t = jnp.where(sub, t - rc[:, kk] * new_state[:, kk], t)
            upd = kk < order - 1
            new_col = jnp.where(upd, rc[:, kk] * t + new_state[:, kk], new_state[:, kk + 1])
            new_state = new_state.at[:, kk + 1].set(new_col)
        new_state = new_state.at[:, 0].set(jnp.where(active, t, new_state[:, 0]))
        out_n = jnp.where(active, t, x_n)
        # inactive lanes keep their previous lattice state untouched
        new_state = jnp.where(active[:, None], new_state, state)
        return new_state, out_n

    init = jnp.zeros((S, 8), F32)
    _, out = jax.lax.scan(step, init, (x.T, jnp.arange(ne, dtype=jnp.int32)))
    return out.T


def exp2_fast(x):
    """fast-math style exp2: 2^floor(x) * quadratic(frac), branch-free.

    Matches the reference decoder's fast_math::exp2_raw
    (decoder/spectral_noise_shaping.rs:122) and is cheaper than exact exp2
    on the VPU: one floor, two fmas, one exponent-field add.
    """
    w = jnp.floor(x)
    z = x - w
    approx = F32(1.0017247) + z * (F32(0.65763628) + z * F32(0.33718944))
    bits = jax.lax.bitcast_convert_type(approx, jnp.int32)
    bits = bits + (w.astype(jnp.int32) << 23)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


# SNS gain tables padded to [4, 8]
_SNS_GAINS = np.zeros((4, 8), dtype=np.float32)
for _j, _g in enumerate(T.SNS_GAINS_BY_SHAPE):
    _SNS_GAINS[_j, : len(_g)] = _g


def sns_synthesis(p: DecoderParams, x, y, shape, gind, ind_lf, ind_hf):
    """SNS decode: stage1 + rotated stage2, interpolate, scale bands."""
    stage1 = jnp.concatenate(
        [jnp.asarray(T.LFCB)[ind_lf], jnp.asarray(T.HFCB)[ind_hf]], axis=1
    )  # [S,16]
    yf = y.astype(F32)
    y_norm = jnp.sqrt(jnp.sum(yf * yf, axis=1))
    gain = jnp.asarray(_SNS_GAINS)[shape, gind]
    gain = jnp.where(y_norm != 0.0, gain / y_norm, gain)

    d = jnp.asarray(T.DCT16)  # [16,16], scf_n needs sum_col y[col]*D[n,col]
    scf = stage1 + gain[:, None] * (yf @ d.T)

    # 16 -> 64 interpolation
    n0 = scf[:, :-1]
    dd = scf[:, 1:] - n0  # [S,15]
    w = jnp.asarray([0.125, 0.375, 0.625, 0.875], F32)
    mids = n0[:, :, None] + w[None, None, :] * dd[:, :, None]  # [S,15,4]
    last_d = scf[:, 15] - scf[:, 14]
    interp = jnp.concatenate(
        [
            scf[:, :1],
            scf[:, :1],
            mids.reshape(x.shape[0], 60),
            (scf[:, 15] + F32(0.125) * last_d)[:, None],
            (scf[:, 15] + F32(0.375) * last_d)[:, None],
        ],
        axis=1,
    )  # [S,64]

    nb = p.cfg.nb
    if nb < 64:  # 8 kHz / 7.5 ms narrow-band reduction (static)
        n2 = 64 - nb
        head = (interp[:, 0 : 2 * n2 : 2] + interp[:, 1 : 2 * n2 : 2]) / F32(2.0)
        tail = interp[:, 2 * n2 : n2 + nb]
        interp = jnp.concatenate([head, tail], axis=1)  # [S, nb]
    else:
        interp = interp[:, :nb]

    g_sns = exp2_fast(interp)  # [S, nb]
    g_lines = g_sns[:, jnp.asarray(p.band_of_line)]
    return x * g_lines


def plc_step(p: DecoderParams, x, state: DecoderState, bad_frame):
    """Packet-loss concealment: replay last good spectrum with random signs."""
    ne = p.ne
    alpha_mul = jnp.where(state.plc_lost < 8, F32(0.9), F32(0.85))
    alpha = jnp.where(state.plc_lost >= 4, state.plc_alpha * alpha_mul, state.plc_alpha)
    steps = jnp.arange(1, ne + 1)
    A = jnp.asarray(p.plc_lcg_A, jnp.uint32)[steps]
    B = jnp.asarray(p.plc_lcg_B, jnp.uint32)[steps]
    seeds = (A[None, :] * state.plc_seed[:, None].astype(jnp.uint32) + B[None, :]) & 0xFFFF
    signed_alpha = jnp.where(seeds < 0x8000, alpha[:, None], -alpha[:, None])
    concealed = state.plc_spec * signed_alpha

    bad = bad_frame[:, None]
    x_out = jnp.where(bad, concealed, x)
    new_state = DecoderState(
        mem_ola=state.mem_ola,
        plc_spec=jnp.where(bad, state.plc_spec, x),
        plc_alpha=jnp.where(bad_frame, alpha, F32(1.0)),
        plc_seed=jnp.where(
            bad_frame,
            ((jnp.asarray(p.plc_lcg_A, jnp.uint32)[ne] * state.plc_seed.astype(jnp.uint32)
              + jnp.asarray(p.plc_lcg_B, jnp.uint32)[ne]) & 0xFFFF).astype(jnp.int32),
            state.plc_seed,
        ),
        plc_lost=jnp.where(bad_frame, state.plc_lost + 1, 0),
        ltpf=state.ltpf,
    )
    return x_out, new_state


def imdct_ola(p: DecoderParams, x, mem_ola):
    """Inverse MDCT + overlap-add as a dense MXU matmul (modified_dct.rs)."""
    nf, z, ne = p.nf, p.cfg.z, p.ne
    half = nf // 2
    buf = jnp.pad(x, ((0, 0), (0, nf - ne)))
    spec = jnp.einsum("sn,nk->sk", buf, jnp.asarray(p.dct), preferred_element_type=F32, precision=jax.lax.Precision.HIGHEST)
    rev = spec[:, ::-1]
    t_hat = jnp.concatenate(
        [spec[:, half:], -rev[:, :half], -rev[:, half:], -spec[:, :half]], axis=1
    )
    t_hat = t_hat * p.imdct_gain
    t_hat = t_hat * jnp.asarray(p.window_rev)[None, :]
    out = jnp.concatenate(
        [mem_ola + t_hat[:, z:nf], t_hat[:, nf : nf + z]], axis=1
    )
    new_mem = t_hat[:, nf + z : 2 * nf]
    return out, new_mem


def output_scale(x):
    shifted = jnp.where(x > 0.0, x + F32(0.5), x - F32(0.5))
    return jnp.clip(shifted.astype(jnp.int32), -32768, 32767).astype(jnp.int16)


# --------------------------------------------------------------- fused step


def decode_step(
    cfg: Lc3Config, nbits: int, state: DecoderState, frames: ParsedFrames,
    use_pallas: bool | None = None,
    ltpf_use_pallas: bool = False,
    debug_taps: bool = False,
) -> tuple[DecoderState, jax.Array]:
    """One batched frame: parsed fields [S, ...] -> (state, pcm int16 [S, nf]).

    use_pallas routes the TNS lattice through the fused Pallas kernel
    (requires S % 128 == 0 and a TPU backend). Default: on for TPU, where
    it is ~20x faster than the lax.scan lowering (0.16 vs 3.25 ms at
    S=2048, device trace), off elsewhere; both are bit-identical."""
    p = decoder_params(cfg)
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() in ("tpu", "axon")
            and frames.x_int.shape[0] % 128 == 0
        )
    x = frames.x_int.astype(F32)
    x = residual_apply(p, x, frames.x_int, frames.residual_bits, frames.n_residual,
                       frames.lsb_mode)
    x = noise_fill(p, x, frames.x_int, frames.nf_seed, frames.bandwidth,
                   frames.noise_factor, frames.zero_frame)
    x = global_gain(p, x, frames.gg_ind, nbits)
    if use_pallas:
        from .pallas_tns import tns_synthesis_pallas

        x = tns_synthesis_pallas(p, x, frames.bandwidth, frames.rc_order, frames.rc_i)
    else:
        x = tns_synthesis(p, x, frames.bandwidth, frames.rc_order, frames.rc_i)
    x = sns_synthesis(p, x, frames.sns_y, frames.sns_shape, frames.sns_gind,
                      frames.sns_ind_lf, frames.sns_ind_hf)
    x, state = plc_step(p, x, state, frames.bad_frame)
    t, new_mem = imdct_ola(p, x, state.mem_ola)
    t_pre = t
    # LTPF stays on the lax.scan + funnel path by default: the Pallas LTPF
    # kernel (pallas_ltpf.py) is bit-compatible and fixes the VMEM spill at
    # S >= 8192, but its compile is slow and not served from the persistent
    # cache on this toolchain (several minutes per process) and it breaks
    # the xprof profiler, so it is opt-in via ltpf_use_pallas until the
    # toolchain catches up. Beyond S=4096 the scan path's per-block slabs
    # spill VMEM; LTPF is elementwise in the stream axis, so large batches
    # run it in S<=_LTPF_CHUNK chunks — each chunk stays VMEM-resident
    # and the spill disappears without the Pallas kernel.
    S_here = frames.x_int.shape[0]
    ltpf_active_v = frames.ltpf_active & ~frames.bad_frame
    pitch_v = jnp.where(frames.bad_frame, 0, frames.pitch_index)
    use_pl = ltpf_use_pallas and S_here % 256 == 0
    ch = _LTPF_CHUNK
    if not use_pl and S_here > ch and S_here % ch == 0:
        # Unrolled static chunks, NOT lax.map: the while-loop lowering of
        # lax.map moved each chunk in/out of stacked HBM buffers via
        # dynamic_update_slice (4.6 ms/step of pure copy at S=8192);
        # static slices + concatenate let XLA schedule the chunks back to
        # back with no staging traffic. The chunk count is static and small
        # (2-8), so the unroll costs nothing at trace time.
        nch = S_here // ch
        ys, states = [], []
        for i in range(nch):
            sl = slice(i * ch, (i + 1) * ch)
            st_c = jax.tree_util.tree_map(lambda a: a[sl], state.ltpf)
            y_c, ns_c = ltpf_run(p, st_c, t[sl], nbits,
                                 ltpf_active_v[sl], pitch_v[sl])
            ys.append(y_c)
            states.append(ns_c)
        t = jnp.concatenate(ys, axis=0)
        new_ltpf = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *states)
    else:
        t, new_ltpf = ltpf_run(
            p, state.ltpf, t, nbits, ltpf_active_v, pitch_v,
            use_pallas=use_pl,
        )
    pcm = output_scale(t)
    new_state = DecoderState(
        mem_ola=new_mem,
        plc_spec=state.plc_spec,
        plc_alpha=state.plc_alpha,
        plc_seed=state.plc_seed,
        plc_lost=state.plc_lost,
        ltpf=new_ltpf,
    )
    if debug_taps:
        # stage-attribution taps matching ref.decoder's: spectral lines after
        # SNS/PLC, time signal after IMDCT+OLA but before LTPF
        return new_state, (pcm, {"x_spec": x, "t_pre_ltpf": t_pre})
    return new_state, pcm


def make_decode_step(cfg: Lc3Config, nbits: int):
    """Jitted batched decode step with state donated for in-place reuse."""
    return jax.jit(partial(decode_step, cfg, nbits), donate_argnums=(0,))
