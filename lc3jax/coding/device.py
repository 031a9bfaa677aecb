"""On-device LC3 bitstream parsing: the range decoder as XLA ops.

SURVEY.md section 7.3 ranks "arithmetic/range coder on device" the hardest
part of the TPU rebuild; this module implements it. A whole batch of raw
frames [S, nbytes] is parsed in one jitted program: dual-ended bit reads are
cursor-indexed gathers, the range decoder's symbol search is a 17-lane
compare-and-count, the spectral tuple loop is a lax.scan over ne/2 steps
with a 14-level unrolled escape ladder, and MPVQ de-enumeration is a fully
unrolled masked walk. Corrupt frames set bad_frame (PLC) instead of
raising — the same recovery contract as the host paths.

Fused with lc3jax.dsp.decoder.decode_step this yields a single XLA program
from frame bytes to PCM (see decode_bytes_step).

Two formulations live here and in pallas_parse.py:

- This module's XLA formulation (lax.scan over tuples, per-stream
  take_along_axis gathers) is the readable reference and the CPU/test
  path, but the gathers serialize at ~20 ns/element on TPU vector units
  (~20-70x realtime at S=2048 — unusable for serving).
- `device_parse` auto-routes TPU backends (S % 128 == 0) to the
  gather-free Pallas kernel in pallas_parse.py: word-funnel cursors,
  one-hot MXU table fetches, early-exit escape ladder. Measured on v5e at
  S=2048/48k/150B: parse 1.16 ms (17,636x realtime), fused bytes->PCM
  1.92 ms = 10,676x realtime with no host work — the production serving
  path (serving.BatchDecoder(device_parse=True)). The threaded host C++
  parser (lc3jax/coding/native, ~4 us/frame/core) remains for
  host-pipelined deployments.

Reference semantics: decoder/side_info_reader.rs, decoder/buffer_reader.rs,
decoder/arithmetic_codec.rs, decoder/spectral_noise_shaping.rs:155-199.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables as T
from ..config import FrameDuration, Lc3Config
from ..dsp.decoder import ParsedFrames

I32 = jnp.int32
U32 = jnp.uint32


class _TailReader:
    """Vectorised backwards bit reader: value reads are 4-byte gathers."""

    def __init__(self, buf_u8: jax.Array):
        self.buf = buf_u8.astype(I32)  # [S, nbytes]
        self.nbytes = buf_u8.shape[1]
        S = buf_u8.shape[0]
        self.cursor = jnp.zeros(S, I32)  # tail bit cursor
        self.error = jnp.zeros(S, bool)

    def _word(self):
        """32-bit little window ending at the current tail byte."""
        byte_index = self.cursor >> 3
        base = self.nbytes - 1 - byte_index  # [S]
        idx = base[:, None] - jnp.arange(4)[None, :]
        vals = jnp.take_along_axis(self.buf, jnp.clip(idx, 0, self.nbytes - 1), axis=1)
        vals = jnp.where(idx >= 0, vals, 0)
        w = vals[:, 0] | (vals[:, 1] << 8) | (vals[:, 2] << 16) | (vals[:, 3] << 24)
        return w, byte_index

    def read(self, nbits, advance=None, active=None):
        """Read nbits (static int <= 25); advance cursor by `advance`
        (defaults to nbits), which may be per-stream — it is also the
        per-stream *effective* bit count used for the overrun check.
        `active` masks the overrun check for streams that logically skip
        this read (their cursor must not advance either: pass advance=0)."""
        w, byte_index = self._word()
        bit = self.cursor & 7
        value = (w.astype(U32) >> bit.astype(U32)).astype(U32)
        mask = (jnp.uint32(1) << jnp.asarray(nbits, U32)) - jnp.uint32(1)
        value = (value & mask).astype(I32)
        adv = jnp.asarray(nbits if advance is None else advance, I32)
        # overrun check mirroring buffer_reader.rs:72 (read_tail_usize with
        # head_byte_cursor == 0: side info is read before the range decoder
        # touches the head). num_bytes = nbits/8 + (2 if the read straddles
        # into a second byte while nbits < 8 else 1).
        bits_left = 8 - bit
        nb = (adv >> 3) + jnp.where((adv > bits_left) & (adv < 8), 2, 1)
        overrun = self.nbytes - byte_index - nb < 0
        if active is not None:
            overrun = overrun & active
        self.error = self.error | (overrun & (adv > 0))
        self.cursor = self.cursor + adv
        return value

    def read_masked(self, nbits: int, do):
        """Read nbits but only advance the cursor where `do` is true."""
        v = self.read(nbits, advance=jnp.where(do, nbits, 0), active=do)
        return jnp.where(do, v, 0)


def _head_byte(buf_i32, head, nbytes, error):
    v = jnp.take_along_axis(buf_i32, jnp.clip(head, 0, nbytes - 1)[:, None], axis=1)[:, 0]
    error = error | (head >= nbytes)
    return v, head + 1, error


def mpvq_deenum(S, dim, k_val, ls_ind, ind, enabled):
    """MPVQ de-enumeration (spectral_noise_shaping.rs:155-199), gather-free:
    the "walk k_acc down while ind < row[k_acc]" loop is a comparison count
    against the static nondecreasing offset row."""
    offsets_np = np.asarray(T.MPVQ_OFFSETS, np.int64)
    y = jnp.zeros((S, 16), I32)
    lead = jnp.where(ls_ind == 0, 1, -1)
    k_max = jnp.full(S, k_val, I32)
    ind = ind.astype(I32)
    done = ~enabled
    for p in range(dim):
        row = offsets_np[dim - 1 - p]  # [11] static python ints
        hit_zero = ~done & (ind == 0)
        y = y.at[:, p].set(jnp.where(hit_zero, k_max * lead, y[:, p]))
        done = done | hit_zero
        cnt = sum((ind >= int(row[j])).astype(I32) for j in range(1, 11))
        k_acc = jnp.minimum(k_max, cnt)  # row[0] == 0 <= ind always
        rowval = jnp.zeros(S, I32)
        for j in range(11):
            if int(row[j]) != 0:
                rowval = rowval + jnp.where(k_acc == j, I32(int(row[j])), 0)
        ind_new = ind - rowval
        k_delta = k_max - k_acc
        put = ~done & (k_delta != 0)
        y = y.at[:, p].set(jnp.where(put, k_delta * lead, y[:, p]))
        lead = jnp.where(put, jnp.where((ind_new & 1) != 0, -1, 1), lead)
        ind = jnp.where(~done, jnp.where(put, ind_new >> 1, ind_new), ind)
        k_max = jnp.where(put, k_acc, k_max)
    return y


def read_side_info(r, cfg: Lc3Config, S: int):
    """Side-info demux through any tail-reader with the `_TailReader`
    interface (side_info_reader.rs:29-103); returns (fields dict, bad)."""
    ne = cfg.ne
    fs_ind = cfg.fs_ind
    bad = jnp.zeros(S, bool)

    nbits_bw = [0, 1, 2, 2, 3][fs_ind]
    if nbits_bw > 0:
        p_bw = r.read(nbits_bw)
        bad = bad | (p_bw > fs_ind)
        p_bw = jnp.minimum(p_bw, fs_ind)
    else:
        p_bw = jnp.zeros(S, I32)

    lastnz_bits = math.ceil(math.log2(ne // 2))
    lastnz = (r.read(lastnz_bits) + 1) << 1
    bad = bad | (lastnz > ne)
    lastnz = jnp.minimum(lastnz, ne)

    lsb_mode = r.read(1).astype(bool)
    gg_ind = r.read(8)

    num_tns = jnp.where(p_bw < 3, 1, 2)
    rc_flag0 = r.read(1)
    rc_flag1 = r.read_masked(1, num_tns == 2)

    pitch_present = r.read(1).astype(bool)

    # SNS VQ demux (side_info_reader.rs:127-200)
    ind_lf = r.read(5)
    ind_hf = r.read(5)
    submode_msb = r.read(1)
    # gain index: 1 bit for submode_msb==0, 2 bits otherwise
    g2 = r.read(2, advance=jnp.where(submode_msb == 0, 1, 2))
    g_ind = jnp.where(submode_msb == 0, g2 & 1, g2 & 3)
    ls_inda = r.read(1)
    msb0 = submode_msb == 0
    tmp = r.read(25, advance=jnp.where(msb0, 25, 24))
    tmp = jnp.where(msb0, tmp, tmp & 0xFFFFFF)
    bad = bad | jnp.where(msb0, tmp >= 33460056, tmp >= 16708096)
    # shape 0/1 split
    idx_bor = tmp // 2390004
    idx_a0 = tmp - idx_bor * 2390004
    sub_lsb0 = jnp.where(idx_bor - 2 < 0, 1, 0)
    ib = idx_bor - 2 + sub_lsb0 * 2
    g_ind0 = jnp.where(sub_lsb0 != 0, (g_ind << 1) + ib, g_ind)
    idx_b0 = jnp.where(sub_lsb0 != 0, 0, ib >> 1)
    ls_indb0 = jnp.where(sub_lsb0 != 0, 0, ib & 1)
    # shape 2/3 split
    hi = tmp >= 15158272
    tmp2 = tmp - jnp.where(hi, 15158272, 0)
    sub_lsb1 = jnp.where(hi, 1, 0)
    g_ind1 = jnp.where(hi, (g_ind << 1) + (tmp2 & 1), g_ind)
    idx_a1 = jnp.where(hi, tmp2 >> 1, tmp2)

    submode_lsb = jnp.where(msb0, sub_lsb0, sub_lsb1)
    g_ind = jnp.where(msb0, g_ind0, g_ind1)
    idx_a = jnp.where(msb0, idx_a0, idx_a1)
    idx_b = jnp.where(msb0, idx_b0, 0)
    ls_indb = jnp.where(msb0, ls_indb0, 0)
    shape_j = (submode_msb << 1) + submode_lsb

    ltpf_active = r.read_masked(1, pitch_present).astype(bool)
    pitch_index = r.read_masked(9, pitch_present)
    noise_factor = r.read(3)
    bad = bad | r.error  # tail-reader overrun during side info
    return dict(
        p_bw=p_bw, lastnz=lastnz, lsb_mode=lsb_mode, gg_ind=gg_ind,
        num_tns=num_tns, rc_flag0=rc_flag0, rc_flag1=rc_flag1,
        pitch_present=pitch_present, ind_lf=ind_lf, ind_hf=ind_hf,
        g_ind=g_ind, idx_a=idx_a, idx_b=idx_b, ls_inda=ls_inda,
        ls_indb=ls_indb, shape_j=shape_j, ltpf_active=ltpf_active,
        pitch_index=pitch_index, noise_factor=noise_factor,
    ), bad


def device_parse(cfg: Lc3Config, nbytes: int, payloads: jax.Array,
                 use_pallas: bool | None = None) -> ParsedFrames:
    """payloads: uint8 [S, nbytes] -> ParsedFrames (device tensors).

    use_pallas=True routes the serial range-decoder core through the
    Pallas kernel in pallas_parse.py (default on TPU backends when S is a
    multiple of 128); the XLA path below is the reference formulation."""
    S = payloads.shape[0]
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon") and S % 128 == 0
    if use_pallas:
        from .pallas_parse import device_parse_pallas

        return device_parse_pallas(cfg, nbytes, payloads)

    ne = cfg.ne
    fs_ind = cfg.fs_ind
    nbits = nbytes * 8
    buf = payloads.astype(I32)

    r = _TailReader(payloads)
    side, bad = read_side_info(r, cfg, S)
    p_bw = side["p_bw"]
    lastnz = side["lastnz"]
    lsb_mode = side["lsb_mode"]
    gg_ind = side["gg_ind"]
    num_tns = side["num_tns"]
    rc_flag0 = side["rc_flag0"]
    rc_flag1 = side["rc_flag1"]
    ind_lf = side["ind_lf"]
    ind_hf = side["ind_hf"]
    g_ind = side["g_ind"]
    idx_a = side["idx_a"]
    idx_b = side["idx_b"]
    ls_inda = side["ls_inda"]
    ls_indb = side["ls_indb"]
    shape_j = side["shape_j"]
    ltpf_active = side["ltpf_active"]
    pitch_index = side["pitch_index"]
    noise_factor = side["noise_factor"]

    # ---------------- arithmetic decoder init (arithmetic_codec.rs:57-65)
    head = jnp.zeros(S, I32)
    err = jnp.zeros(S, bool)
    b0, head, err = _head_byte(buf, head, nbytes, err)
    b1, head, err = _head_byte(buf, head, nbytes, err)
    b2, head, err = _head_byte(buf, head, nbytes, err)
    low = ((b0 << 16) | (b1 << 8) | b2).astype(U32)
    rng = jnp.full(S, 0x00FFFFFF, U32)

    cum_spec = jnp.asarray(T.AC_SPEC_CUMFREQ, I32)  # [64,17]
    freq_spec = jnp.asarray(T.AC_SPEC_FREQ, I32)
    lookup = jnp.asarray(T.AC_SPEC_LOOKUP, I32)

    def ac_decode(low, rng, head, err, cum_rows, freq_rows, active):
        """cum_rows/freq_rows: [S,K]. Masked range-decode one symbol."""
        tmp16 = rng >> 10  # uint32
        err = err | (active & (low >= (tmp16 << 10)))
        prods = tmp16[:, None] * cum_rows.astype(U32)  # [S,K]
        val = jnp.sum((low[:, None] >= prods)[:, 1:], axis=1).astype(I32)
        cum_v = jnp.take_along_axis(cum_rows, val[:, None], 1)[:, 0].astype(U32)
        frq_v = jnp.take_along_axis(freq_rows, val[:, None], 1)[:, 0].astype(U32)
        new_low = low - tmp16 * cum_v
        new_rng = tmp16 * frq_v
        for _ in range(2):  # renormalisation needs at most two byte pulls
            need = new_rng < 0x10000
            byte, head2, err2 = _head_byte(buf, head, nbytes, err)
            new_low = jnp.where(
                need, ((new_low << 8) & 0xFFFFFF) + byte.astype(U32), new_low
            )
            new_rng = jnp.where(need, new_rng << 8, new_rng)
            head = jnp.where(need & active, head2, head)
            err = jnp.where(need & active, err2, err)
        low = jnp.where(active, new_low, low)
        rng = jnp.where(active, new_rng, rng)
        return val, low, rng, head, err

    # ---------------- TNS data (arithmetic_codec.rs:307-344)
    is_7p5 = cfg.n_ms == FrameDuration.MS7P5
    lpcw = 1 if nbits < (360 if is_7p5 else 480) else 0
    order_cum = jnp.asarray(T.AC_TNS_ORDER_CUMFREQ, I32)[lpcw]
    order_freq = jnp.asarray(T.AC_TNS_ORDER_FREQ, I32)[lpcw]
    coef_cum = jnp.asarray(T.AC_TNS_COEF_CUMFREQ, I32)
    coef_freq = jnp.asarray(T.AC_TNS_COEF_FREQ, I32)

    rc_order = jnp.stack([rc_flag0, rc_flag1], axis=1)
    rc_i = jnp.zeros((S, 16), I32)
    for f in range(2):
        in_filter = (f < num_tns) & (rc_order[:, f] > 0)
        val, low, rng, head, err = ac_decode(
            low, rng, head, err,
            jnp.broadcast_to(order_cum, (S, 8)), jnp.broadcast_to(order_freq, (S, 8)),
            in_filter,
        )
        order_f = jnp.where(in_filter, val + 1, rc_order[:, f])
        rc_order = rc_order.at[:, f].set(order_f)
        for k in range(8):
            ink = in_filter & (k < order_f)
            val, low, rng, head, err = ac_decode(
                low, rng, head, err,
                jnp.broadcast_to(coef_cum[k], (S, 17)),
                jnp.broadcast_to(coef_freq[k], (S, 17)),
                ink,
            )
            rc_i = rc_i.at[:, f * 8 + k].set(jnp.where(ink, val, rc_i[:, f * 8 + k]))

    # ---------------- spectral data scan (arithmetic_codec.rs:211-305)
    rate_flag = 512 if nbits > (160 + fs_ind * 160) else 0

    def tail_bit(cursor, do, head, err):
        byte_index = cursor >> 3
        bit = cursor & 7
        idx = jnp.clip(nbytes - 1 - byte_index, 0, nbytes - 1)
        byte = jnp.take_along_axis(buf, idx[:, None], 1)[:, 0]
        v = ((byte >> bit) & 1).astype(bool) & do
        # overrun check mirroring buffer_reader.rs:104 (read_tail_bool)
        err = err | (do & (nbytes - head - byte_index + 2 < 0))
        return v, cursor + jnp.where(do, 1, 0), err

    def spec_step(carry, n):
        low, rng, head, err, cursor, c = carry
        in_range = (n < lastnz) & ~bad
        t = c + rate_flag + jnp.where(n > ne // 2, 256, 0)

        def level_body(_, st):
            low, rng, head, err, cursor, xk, xk1, sym, lev, going = st
            pki = lookup[jnp.clip(t + jnp.minimum(lev, 3) * 1024, 0, 4095)]
            val, low, rng, head, err = ac_decode(
                low, rng, head, err, cum_spec[pki], freq_spec[pki], going
            )
            sym = jnp.where(going, val, sym)
            esc = going & (val >= 16)
            read_lsbs = esc & (~lsb_mode | (lev > 0))
            bit_a, cursor, err = tail_bit(cursor, read_lsbs, head, err)
            bit_b, cursor, err = tail_bit(cursor, read_lsbs, head, err)
            xk = xk + jnp.where(read_lsbs, bit_a.astype(I32) << lev, 0)
            xk1 = xk1 + jnp.where(read_lsbs, bit_b.astype(I32) << lev, 0)
            lev = jnp.where(esc, lev + 1, lev)
            return (low, rng, head, err, cursor, xk, xk1, sym, lev, esc)

        zeros = jnp.zeros(S, I32)
        (low, rng, head, err, cursor, xk, xk1, sym, lev, _) = jax.lax.fori_loop(
            0, 14, level_body,
            (low, rng, head, err, cursor, zeros, zeros, zeros, zeros, in_range),
        )
        save_lev_n = jnp.where(lsb_mode, lev, 0)
        a = sym & 3
        b = sym >> 2
        xk = xk + jnp.where(in_range, a << lev, 0)
        xk1 = xk1 + jnp.where(in_range, b << lev, 0)
        sbit_a, cursor, err = tail_bit(cursor, in_range & (xk > 0), head, err)
        xk = jnp.where(sbit_a, -xk, xk)
        sbit_b, cursor, err = tail_bit(cursor, in_range & (xk1 > 0), head, err)
        xk1 = jnp.where(sbit_b, -xk1, xk1)
        lev_c = jnp.minimum(lev, 3)
        t_next = jnp.where(lev_c <= 1, 1 + (a + b) * (lev_c + 1), 12 + lev_c)
        c = jnp.where(in_range, (c & 15) * 16 + t_next, c)
        return (low, rng, head, err, cursor, c), (xk, xk1, save_lev_n)

    init = (low, rng, head, err, r.cursor, jnp.zeros(S, I32))
    (low, rng, head, err, cursor, _), (xks, xk1s, save_levs) = jax.lax.scan(
        spec_step, init, jnp.arange(0, ne, 2, dtype=I32)
    )
    x = jnp.stack([xks, xk1s], axis=2).transpose(1, 0, 2).reshape(S, ne)
    save_lev = (
        jnp.stack([save_levs, jnp.zeros_like(save_levs)], 2)
        .transpose(1, 0, 2)
        .reshape(S, ne)
    )
    pos = jnp.arange(ne)[None, :]
    x = jnp.where(pos < lastnz[:, None], x, 0)

    # ---------------- residual bits (arithmetic_codec.rs:160-208, 390-405)
    # floor(log2(range)) via exponent extraction on the f32 cast is unsafe at
    # 2^24 boundaries; use a 25-lane comparison instead
    log2rng = jnp.sum(
        rng[:, None] >= (jnp.uint32(1) << jnp.arange(1, 25, dtype=U32))[None, :], axis=1
    ).astype(I32)
    nbits_side = cursor - 8
    nbits_ari = (head + 1 - 3) * 8 + 25 - log2rng
    neg_budget = nbits < nbits_side + nbits_ari
    nres_avail = jnp.maximum(0, nbits - nbits_side - nbits_ari)

    # non-lsb path: one bit per nonzero line, capped — pure gathers
    nz = x != 0
    bitpos = jnp.cumsum(nz, axis=1) - 1
    can_read = nz & (bitpos < nres_avail[:, None]) & ~lsb_mode[:, None]
    read_cursor = cursor[:, None] + bitpos
    byte_index = read_cursor >> 3
    bit = read_cursor & 7
    idx = jnp.clip(nbytes - 1 - byte_index, 0, nbytes - 1)
    bytes_g = jnp.take_along_axis(buf, idx, 1)
    # residual_bits is spectrally aligned (bit for line k lives at index k),
    # matching the host parsers — no compaction scatter needed
    residual_bits = (((bytes_g >> bit) & 1) != 0) & can_read
    n_residual = jnp.where(lsb_mode, 0, jnp.sum(can_read, axis=1)).astype(I32)
    # per-read overrun check (buffer_reader.rs:104 via read_res_bit)
    err = err | jnp.any(
        can_read & (nbytes - head[:, None] - byte_index + 2 < 0), axis=1
    )
    bad = bad | err | neg_budget

    # lsb path: sequential budgeted refinement (mutates x) — scan over tuples.
    # The reference breaks out once the budget runs out; masking every read
    # by budget>0 is equivalent since the budget never recovers.
    def lsb_step(carry, n):
        cur, budget, xs, lerr = carry
        slev_n = jax.lax.dynamic_index_in_dim(save_lev, n, axis=1, keepdims=False)
        pair_on = lsb_mode & (n < lastnz) & ~bad & (slev_n > 0)

        def one(idx_col, cur, budget, xs, lerr):
            can = pair_on & (budget > 0)
            b1, cur, lerr = tail_bit(cur, can, head, lerr)
            budget = budget - jnp.where(can, 1, 0)
            xv = jnp.take_along_axis(xs, idx_col[:, None], 1)[:, 0]
            pos_v = can & b1 & (xv > 0)
            neg_v = can & b1 & (xv < 0)
            zer_v = can & b1 & (xv == 0)
            can2 = zer_v & (budget > 0)
            b2, cur, lerr = tail_bit(cur, can2, head, lerr)
            budget = budget - jnp.where(can2, 1, 0)
            new_xv = jnp.where(pos_v, xv + 1, xv)
            new_xv = jnp.where(neg_v, new_xv - 1, new_xv)
            new_xv = jnp.where(can2, jnp.where(b2, -1, 1), new_xv)
            xs = jax.vmap(lambda row, i, v: row.at[i].set(v))(xs, idx_col, new_xv)
            return cur, budget, xs, lerr

        idx0 = jnp.full(S, 0, I32) + n
        cur, budget, xs, lerr = one(idx0, cur, budget, xs, lerr)
        cur, budget, xs, lerr = one(idx0 + 1, cur, budget, xs, lerr)
        return (cur, budget, xs, lerr), None

    (cursor2, _, x_lsb, lsb_err), _ = jax.lax.scan(
        lsb_step, (cursor, nres_avail, x, jnp.zeros(S, bool)),
        jnp.arange(0, ne, 2, dtype=I32),
    )
    x = jnp.where(lsb_mode[:, None], x_lsb, x)
    bad = bad | lsb_err

    seed = (jnp.sum(jnp.abs(x) * pos, axis=1) & 0xFFFF).astype(I32)
    zero_frame = (lastnz == 2) & (x[:, 0] == 0) & (x[:, 1] == 0) & (gg_ind == 0)

    # ---------------- MPVQ de-enumeration (spectral_noise_shaping.rs:155-199)
    deenum = partial(mpvq_deenum, S)

    yA10 = deenum(10, 10, ls_inda, idx_a, (shape_j == 0) | (shape_j == 1))
    yB6 = deenum(6, 1, ls_indb, idx_b, shape_j == 0)
    y2_ = deenum(16, 8, ls_inda, idx_a, shape_j == 2)
    y3_ = deenum(16, 6, ls_inda, idx_a, shape_j == 3)
    lane = jnp.arange(16)[None, :]
    y01 = jnp.where(lane < 10, yA10, jnp.where(shape_j[:, None] == 0,
                                               jnp.roll(yB6, 10, axis=1), 0))
    sns_y = jnp.where(shape_j[:, None] <= 1, y01,
                      jnp.where(shape_j[:, None] == 2, y2_, y3_))

    return ParsedFrames(
        x_int=jnp.where(bad[:, None], 0, x),
        lsb_mode=lsb_mode,
        gg_ind=gg_ind,
        rc_order=rc_order,
        rc_i=rc_i,
        bandwidth=p_bw,
        noise_factor=noise_factor,
        nf_seed=jnp.where(bad, 0, seed),
        zero_frame=zero_frame,
        residual_bits=residual_bits,
        n_residual=n_residual,
        sns_y=sns_y,
        sns_shape=shape_j,
        sns_gind=g_ind,
        sns_ind_lf=ind_lf,
        sns_ind_hf=ind_hf,
        ltpf_active=ltpf_active & ~bad,
        pitch_index=jnp.where(bad, 0, pitch_index),
        bad_frame=bad,
    )


def decode_bytes_step(cfg: Lc3Config, nbytes: int, state, payloads: jax.Array):
    """Fully fused: raw frame bytes [S, nbytes] -> PCM, one XLA program."""
    from ..dsp.decoder import decode_step

    frames = device_parse(cfg, nbytes, payloads)
    return decode_step(cfg, nbytes * 8, state, frames)


def decode_bytes_step_stats(cfg: Lc3Config, nbytes: int, state,
                            payloads: jax.Array):
    """decode_bytes_step that also returns the batch's concealed-frame count
    (device scalar), so fused-path serving can report plc_rate — the host
    paths count bad frames during parsing, and monitoring that alerts on
    plc_rate must not go blind when switching to device_parse."""
    from ..dsp.decoder import decode_step

    frames = device_parse(cfg, nbytes, payloads)
    state, pcm = decode_step(cfg, nbytes * 8, state, frames)
    return state, pcm, jnp.sum(frames.bad_frame.astype(I32))


def make_decode_bytes_step(cfg: Lc3Config, nbytes: int):
    return jax.jit(partial(decode_bytes_step, cfg, nbytes), donate_argnums=(0,))
