"""Batched LTPF synthesis filter (reference decoder/long_term_post_filter.rs).

The post filter is an IIR whose denominator taps read the *filter output*
pitch_int - l_den/2 samples back. Because pitch_int >= 18 for every config,
samples can be produced in blocks of B <= 16 with no intra-block dependency:
a lax.scan over blocks does vectorised gathers against the already-written
output buffer (classic blocked-IIR trick; the reference computes sample by
sample, decoder/long_term_post_filter.rs:380-396).

The five transition cases (inactive / fade-in / fade-out / steady /
pitch-change) are computed as two masked passes over the frame:
pass A produces the fade-out signal (cases 3 and 5); pass B produces the
final output, reading a snapshot of pass A for case 5's fade-in (the
reference's `scratch`, :345-378).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .params import DecoderParams

F32 = jnp.float32


@jax.tree_util.register_dataclass
@dataclass
class LtpfState:
    hist_x: jax.Array  # f32 [S, H] last H filter inputs
    hist_y: jax.Array  # f32 [S, H] last H filter outputs
    c_num: jax.Array  # f32 [S, l_num+1]
    c_den: jax.Array  # f32 [S, l_den+1]
    p_int: jax.Array  # int32 [S]
    p_fr: jax.Array  # int32 [S]
    active: jax.Array  # bool [S]


def ltpf_init(p: DecoderParams, n_streams: int) -> LtpfState:
    H = p.num_mem_blocks * p.nf
    return LtpfState(
        hist_x=jnp.zeros((n_streams, H), F32),
        hist_y=jnp.zeros((n_streams, H), F32),
        c_num=jnp.zeros((n_streams, p.l_num + 1), F32),
        c_den=jnp.zeros((n_streams, p.l_den + 1), F32),
        p_int=jnp.zeros((n_streams,), jnp.int32),
        p_fr=jnp.zeros((n_streams,), jnp.int32),
        active=jnp.zeros((n_streams,), bool),
    )


def _gains(p: DecoderParams, nbits: int) -> tuple[float, int]:
    """(gain_ltpf, gain_ind) — static per program (nbits is static)."""
    if p.cfg.n_ms.value == "7.5ms":
        import numpy as np

        t_nbits = int(np.floor(nbits * 10.0 / 7.5 + 0.5))
    else:
        t_nbits = nbits
    base = p.cfg.fs_ind * 80
    for thresh, gain, ind in ((320, 0.4, 0), (400, 0.35, 1), (480, 0.3, 2), (560, 0.25, 3)):
        if t_nbits < thresh + base:
            return gain, ind
    return 0.0, 0


def _filter_params(p: DecoderParams, pitch_index):
    """pitch_index [S] -> (p_int, p_fr) at the output rate; exact in f32."""
    pi = pitch_index
    int_hi = pi - 283
    int_mid = pi // 2 - 63
    fr_mid = 2 * pi - 4 * int_mid - 252
    int_lo = pi // 4 + 32
    fr_lo = pi + 128 - 4 * int_lo
    pitch_int12 = jnp.where(pi >= 440, int_hi, jnp.where(pi >= 380, int_mid, int_lo))
    pitch_fr12 = jnp.where(pi >= 440, 0, jnp.where(pi >= 380, fr_mid, fr_lo))
    pitch = pitch_int12.astype(F32) + pitch_fr12.astype(F32) / F32(4.0)
    pitch_fs = pitch * p.pitch_scale
    p_up = (pitch_fs * F32(4.0) + F32(0.5)).astype(jnp.int32)
    return p_up // 4, p_up - 4 * (p_up // 4)


def _reach_back(p) -> int:
    """Max denominator reach-back = max p_int + ceil(l_den/2).

    TPU gathers with per-stream indices serialize (~20 ns/element measured
    on v5e), so the filter passes avoid them entirely; this bound sizes the
    per-block slab the funnel shifter selects from.
    """
    import numpy as np

    pi = np.arange(512)
    int_hi = pi - 283
    int_mid = pi // 2 - 63
    fr_mid = 2 * pi - 4 * int_mid - 252
    int_lo = pi // 4 + 32
    fr_lo = pi + 128 - 4 * int_lo
    p12 = np.where(pi >= 440, int_hi, np.where(pi >= 380, int_mid, int_lo))
    f12 = np.where(pi >= 440, 0, np.where(pi >= 380, fr_mid, fr_lo))
    pitch = (p12.astype(np.float32) + f12.astype(np.float32) / np.float32(4.0))
    p_up = (pitch * p.pitch_scale * np.float32(4.0) + np.float32(0.5)).astype(np.int32)
    p_int_max = int((p_up // 4).max())
    return p_int_max + (p.l_den - p.l_den // 2)


from .gatherfree import funnel_rows as _funnel_rows
from .gatherfree import shifted_stack as _shifted_stack


def _blocked_filter_pass(p, xcat, ycat_init, num_src, c_num, c_den, p_int, fade, H):
    """Run the IIR in blocks of B samples.

    y[n] = num_src-based output with
    filt(n) = sum_k c_num[k]*num_src[off+n-k] - sum_k c_den[k]*ycat[H+n-d-k],
    d = p_int - l_den//2, and y[n] = base[n] - fade[n]*filt(n); base is
    num_src at offset (x for the normal cases, scratch for case-5 fade-in).
    Returns the filled ycat.

    Gather-free: numerator windows are stream-invariant (dynamic_slice +
    static shifts); denominator windows sit at a per-stream but
    frame-constant offset (pitch lag), extracted by a funnel shifter from a
    per-block slab.
    """
    nf = p.nf
    B = 16 if nf % 16 == 0 else 15
    nblocks = nf // B
    l_num, l_den = p.l_num, p.l_den
    S = xcat.shape[0]
    rb = _reach_back(p)
    assert H >= rb, (H, rb)
    ceil_half = l_den - l_den // 2
    W = B + l_den
    sw = rb + W  # slab width; off in [0, rb]
    off = jnp.clip(rb - p_int - ceil_half, 0, sw - W)

    # right-pad so the last block's slab never clamps (pad is never written)
    ycat_init = jnp.pad(ycat_init, ((0, 0), (0, l_den)))

    def block(ycat, bi):
        win = jax.lax.dynamic_slice_in_dim(num_src, H + bi * B - l_num, B + l_num, axis=1)
        num_vals = _shifted_stack(win, l_num, B)
        num = jnp.einsum("sbk,sk->sb", num_vals, c_num, preferred_element_type=F32, precision=jax.lax.Precision.HIGHEST)

        slab = jax.lax.dynamic_slice_in_dim(ycat, H + bi * B - rb, sw, axis=1)
        w = _funnel_rows(slab, off, W)  # w[s,j] = ycat[s, H+bi*B - p_int - ceil_half + j]
        den_vals = _shifted_stack(w, l_den, B)
        den = jnp.einsum("sbk,sk->sb", den_vals, c_den, preferred_element_type=F32, precision=jax.lax.Precision.HIGHEST)

        base_blk = jax.lax.dynamic_slice_in_dim(num_src, H + bi * B, B, axis=1)
        fade_blk = jax.lax.dynamic_slice_in_dim(fade, bi * B, B, axis=0)
        y_blk = base_blk - fade_blk[None, :] * (num - den)
        ycat = jax.lax.dynamic_update_slice_in_dim(ycat, y_blk, H + bi * B, axis=1)
        return ycat, None

    # the cross-block recurrence is real (den reaches >= 18 samples back),
    # but the per-step XLA loop overhead isn't: unrolled, the two passes
    # drop from 0.40 ms to the pure dependency chain at S=2048
    ycat, _ = jax.lax.scan(block, ycat_init, jnp.arange(nblocks),
                           unroll=True)
    return ycat[:, : H + nf]


def ltpf_run(p: DecoderParams, st: LtpfState, x, nbits: int, active, pitch_index,
             use_pallas: bool = False, pallas_interpret: bool = False):
    """One batched LTPF frame: (state, x [S,nf]) -> (y [S,nf], state).

    use_pallas runs both filter passes as one VMEM-resident Pallas kernel
    (pallas_ltpf.py) — same blocked-IIR + funnel-shifter algorithm, but
    immune to the VMEM spill that makes the lax.scan path superlinear
    beyond S~4096. Requires S % 256 == 0."""
    nf = p.nf
    S = x.shape[0]
    H = p.num_mem_blocks * nf
    s2p5 = p.sample_2p5ms
    norm = F32(p.norm)

    p_int, p_fr = _filter_params(p, pitch_index)
    p_int = jnp.where(active, p_int, 0)
    p_fr = jnp.where(active, p_fr, 0)

    gain_ltpf, gain_ind = _gains(p, nbits)
    c_num_new = jnp.where(
        active[:, None],
        F32(0.85) * F32(gain_ltpf) * jnp.asarray(p.ltpf_num_tab)[gain_ind][None, :],
        0.0,
    )
    c_den_new = jnp.where(
        active[:, None],
        F32(gain_ltpf) * jnp.asarray(p.ltpf_den_tab)[p_fr],
        0.0,
    )

    case_inactive = ~active & ~st.active
    case_fade_in = active & ~st.active
    case_fade_out = ~active & st.active
    same_pitch = (p_int == st.p_int) & (p_fr == st.p_fr)
    case_steady = active & st.active & same_pitch
    case_pitch_change = active & st.active & ~same_pitch

    xcat = jnp.concatenate([st.hist_x, x], axis=1)  # [S, H+nf]
    n_idx = jnp.arange(nf)
    fade_up = jnp.where(n_idx < s2p5, n_idx.astype(F32) / norm, F32(1.0))
    fade_down = jnp.where(n_idx < s2p5, F32(1.0) - n_idx.astype(F32) / norm, F32(0.0))

    in_fade = (n_idx < s2p5)[None, :]
    # case-5 fade-in samples (n < s2p5) read base and numerator from the
    # pass-A scratch snapshot (:352-377); everything else reads the raw
    # input. The numerator window of a post-fade sample reaches back into
    # the fade region but must still read raw input there, so the selection
    # is per OUTPUT position, not per buffer position.
    use_scratch = case_pitch_change[:, None] & in_fade  # [S, nf]
    fadeB = jnp.where(case_steady[:, None], F32(1.0), fade_up[None, :])
    fadeB = jnp.broadcast_to(fadeB, (S, nf))

    if use_pallas:
        from .pallas_ltpf import ltpf_both_passes_pallas

        yA, yB = ltpf_both_passes_pallas(
            p, xcat, st.hist_y, st.c_num, st.c_den, st.p_int,
            c_num_new, c_den_new, p_int, fade_down, fadeB, use_scratch,
            H, _reach_back(p), interpret=pallas_interpret,
        )
    else:
        # ---- pass A: fade-out with previous coefficients (cases 3, 5)
        ycatA_init = jnp.concatenate([st.hist_y, jnp.zeros((S, nf), F32)], axis=1)
        ycatA = _blocked_filter_pass(
            p, xcat, ycatA_init, xcat, st.c_num, st.c_den, st.p_int, fade_down, H
        )
        yA = ycatA[:, H:]

        # case-5 fade-in numerator source: snapshot of the faded-out output,
        # laid out so index H + n - k hits scratch[l_num + n - k]
        scratch_src = jnp.concatenate(
            [jnp.zeros((S, H - p.l_num), F32), ycatA[:, H - p.l_num : H], yA], axis=1
        )

        # ---- pass B: final output with new coefficients
        ycatB_init = jnp.concatenate([st.hist_y, jnp.zeros((S, nf), F32)], axis=1)
        ycatB = _blocked_filter_pass_perstream(
            p, xcat, ycatB_init, xcat, scratch_src, use_scratch,
            c_num_new, c_den_new, p_int, fadeB, H,
        )
        yB = ycatB[:, H:]

    y = jnp.where(case_inactive[:, None], x, yB)
    y = jnp.where(
        case_fade_out[:, None],
        jnp.where(in_fade, yA, x),
        y,
    )

    new_state = LtpfState(
        hist_x=xcat[:, nf:],
        hist_y=jnp.concatenate([st.hist_y, y], axis=1)[:, nf:],
        c_num=c_num_new,
        c_den=c_den_new,
        p_int=p_int,
        p_fr=p_fr,
        active=active,
    )
    return y, new_state


def _blocked_filter_pass_perstream(
    p, xcat, ycat_init, num_src_x, num_src_scr, use_scratch, c_num, c_den, p_int, fade, H
):
    """Blocked IIR with per-output-position numerator-source selection.

    use_scratch [S, nf] selects, per output sample, whether the base value
    and the whole numerator window come from the scratch snapshot (case-5
    fade-in) or from the raw input.
    """
    nf = p.nf
    B = 16 if nf % 16 == 0 else 15
    nblocks = nf // B
    l_num, l_den = p.l_num, p.l_den
    rb = _reach_back(p)
    assert H >= rb, (H, rb)
    ceil_half = l_den - l_den // 2
    W = B + l_den
    sw = rb + W
    off = jnp.clip(rb - p_int - ceil_half, 0, sw - W)

    ycat_init = jnp.pad(ycat_init, ((0, 0), (0, l_den)))

    def num_windows(src, bi):
        win = jax.lax.dynamic_slice_in_dim(src, H + bi * B - l_num, B + l_num, axis=1)
        return _shifted_stack(win, l_num, B)

    def block(ycat, bi):
        sel = jax.lax.dynamic_slice_in_dim(use_scratch, bi * B, B, axis=1)  # [S,B]
        num_x = jnp.einsum(
            "sbk,sk->sb", num_windows(num_src_x, bi), c_num,
            preferred_element_type=F32, precision=jax.lax.Precision.HIGHEST,
        )
        num_s = jnp.einsum(
            "sbk,sk->sb", num_windows(num_src_scr, bi), c_num,
            preferred_element_type=F32, precision=jax.lax.Precision.HIGHEST,
        )
        num = jnp.where(sel, num_s, num_x)

        slab = jax.lax.dynamic_slice_in_dim(ycat, H + bi * B - rb, sw, axis=1)
        w = _funnel_rows(slab, off, W)
        den_vals = _shifted_stack(w, l_den, B)
        den = jnp.einsum("sbk,sk->sb", den_vals, c_den, preferred_element_type=F32, precision=jax.lax.Precision.HIGHEST)

        base_x = jax.lax.dynamic_slice_in_dim(num_src_x, H + bi * B, B, axis=1)
        base_s = jax.lax.dynamic_slice_in_dim(num_src_scr, H + bi * B, B, axis=1)
        base_blk = jnp.where(sel, base_s, base_x)
        fade_blk = jax.lax.dynamic_slice_in_dim(fade, bi * B, B, axis=1)
        y_blk = base_blk - fade_blk * (num - den)
        ycat = jax.lax.dynamic_update_slice_in_dim(ycat, y_blk, H + bi * B, axis=1)
        return ycat, None

    ycat, _ = jax.lax.scan(block, ycat_init, jnp.arange(nblocks),
                           unroll=True)
    return ycat[:, : H + nf]
