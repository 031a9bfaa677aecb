"""Pallas TPU kernel: the LC3 range *encoder* — frame assembly on device.

Round 1 left one asymmetry in the coding layer: decode had an on-device
bytes->PCM path but the encoder's pack stage (side-info bit writer +
forward range coder with carry/cache propagation, reference
encoder/bitstream_encoding.rs + buffer_writer.rs) ran only on host C++,
leaving encode end-to-end host-bound. The round-2 kernel closed that but
fetched every arithmetic-coder operand with per-tuple one-hot matmuls and
drained carries through data-dependent while loops — ~1.4 ms/step at
S=2048, 2.6x the cost of the matching range *decoder* kernel.

This round-3 kernel strips the serial core down to pure range-coder
sequencing:

- **No table lookups.** Every (cum, freq) the coder consumes is
  precomputed by the encoder's second bit-model pass (the contexts are
  closed-form in the tuple values — see dsp.encoder.bit_consumption), whose
  pallas kernel emits them off one-hot matmuls it already builds
  (dsp/pallas_bitmodel.py, fields["quant_pack_tables"]). The kernel reads
  [row, lanes] slices from VMEM.
- **Optimistic carry resolution.** The reference's cache/carry_count
  machinery (bitstream_encoding.rs:397-415) delays byte emission so a
  carry can rewrite a pending 0xFF run. A slot that pends always holds
  0xFF (pend requires low >= 0xFF0000), so this kernel writes low>>16 at
  every shift unconditionally, marks carried flush groups in two word-bit
  masks, and applies the (+1 at the cache byte, truncated exactly like the
  reference's `(cache + carry) & 0xff`; zeros over the pending run) as
  disjoint group fix-ups in one pass at the end. At most one carry per
  flush group, and groups never overlap, so no ripple across groups can
  occur. The data-dependent drain loops disappear.
- **Scalar-bounded escape ladder.** The per-tuple escape count g is
  elementwise in |x_q| (g halvings until max(a,b) < 4); its per-tuple
  batch maximum is computed in XLA and fed through SMEM, so the ladder is
  a scalar-trip fori_loop with no cross-lane `jnp.any` reductions.

Byte-exact vs ref/bitstream_enc.py (itself byte-exact vs the reference)
and the C++ packer — asserted in tests/test_pallas_pack.py (interpret
mode on CPU, incl. crafted carry-run/need-extra/lsb batches) and on
hardware across the geometry envelope in tools/tpu_parity.py --full.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tables as T
from ..config import FrameDuration, Lc3Config

I32 = jnp.int32

# state rows
LOW, RNG, BP, CARRY, RSTART, HASC, HL0, TCUR, CNT, BUD = range(10)

# head-stream ring height (words): arithmetic-coder byte emissions land in
# a [HRING, lanes] ring keyed by word index mod HRING, so the per-symbol
# masked OR is HRING rows tall instead of nwp (104 rows at 400 B). The ring
# drains to head_ref in banded ORs at flush points chosen so the word
# cursor can never advance more than HRING-1 words in between: <= 15
# symbols per spectral tuple x <= 2 renorm bytes = <= 30 bytes = <= 8
# words, and the TNS phase emits <= 18 symbols = <= 9 words + alignment.
HRING = 16


def _pack_kernel(ne: int, nbytes: int, nwp: int, ntp: int, lanes: int,
                 lpcw: int, nbits_bw: int, mrows: int,
                 gmax_ref, xq_ref, res_ref, side_ref, pk_ref,
                 head_ref, tail_ref,
                 st, ms, me, hr):
    NT = ne // 2
    nbits = nbytes * 8
    oc = [int(v) for v in np.asarray(T.AC_TNS_ORDER_CUMFREQ)[lpcw]]
    of = [int(v) for v in np.asarray(T.AC_TNS_ORDER_FREQ)[lpcw]]
    cc = [[int(v) for v in row] for row in np.asarray(T.AC_TNS_COEF_CUMFREQ)]
    cf = [[int(v) for v in row] for row in np.asarray(T.AC_TNS_COEF_FREQ)]
    gmsb = [int(v) for v in np.asarray(T.SNS_GAIN_MSB_BITS)]
    glsb = [int(v) for v in np.asarray(T.SNS_GAIN_LSB_BITS)]
    iotaw = jax.lax.broadcasted_iota(I32, (nwp, lanes), 0)
    # mark words cover byte positions < 32*mrows >= nbytes + margin: half
    # the rows of the old fixed [16, lanes] buffers at 150 B — the mark ORs
    # sit on every ac_encode, so their row count is pure per-symbol cost
    iota_m = jax.lax.broadcasted_iota(I32, (mrows, lanes), 0)
    iota_r = jax.lax.broadcasted_iota(I32, (HRING, lanes), 0)

    lastnz_trunc = side_ref[0, :]
    lsb_mode = side_ref[1, :] > 0
    gg_ind = side_ref[2, :]
    num_tns = side_ref[3, :]
    rc_order0 = side_ref[4, :]
    rc_order1 = side_ref[5, :]
    pitch_present = side_ref[6, :] > 0
    ltpf_active = side_ref[7, :]
    pitch_index = side_ref[8, :]
    ind_lf = side_ref[9, :]
    ind_hf = side_ref[10, :]
    shape_j = side_ref[11, :]
    gind = side_ref[12, :]
    ls_inda = side_ref[13, :]
    index_joint = side_ref[14, :]
    bandwidth = side_ref[15, :]
    noise_factor = side_ref[16, :]
    n_residual = side_ref[17, :]

    head_ref[...] = jnp.zeros((nwp, lanes), I32)
    tail_ref[...] = jnp.zeros((nwp, lanes), I32)
    st[...] = jnp.zeros((16, lanes), I32)
    ms[...] = jnp.zeros((mrows, lanes), I32)
    me[...] = jnp.zeros((mrows, lanes), I32)
    hr[...] = jnp.zeros((HRING, lanes), I32)
    st[RNG, :] = jnp.full((lanes,), 0x00FFFFFF, I32)

    # ---- writers ----------------------------------------------------------
    # Head bytes accumulate in the hr ring (word index mod HRING); ORs are
    # idempotent and each ring row holds exactly one word's bytes between
    # flushes, so draining is a masked band copy (see flush_head).
    def write_byte_at(byte, pos, do):
        wi = pos >> 2
        upd = jnp.where(
            (iota_r == (wi & (HRING - 1))[None, :]) & do[None, :],
            (byte & 255)[None, :] << (((pos & 3) * 8)[None, :]), 0,
        )
        hr[...] = hr[...] | upd

    def flush_head():
        """Drain the head ring: OR each ring row into its head word. The
        flush window (w-HRING, w] selects exactly one target row per ring
        row (older rows were zeroed at the previous flush), then every row
        but the current partial word's is cleared for reuse."""
        w = ((st[BP, :] - 1) >> 2)[None, :]  # last written word; -1 if none
        reps = -(-nwp // HRING)
        tiled = jnp.concatenate([hr[...]] * reps, axis=0)[:nwp]
        m = (iotaw <= w) & (iotaw > w - HRING)
        head_ref[...] = head_ref[...] | jnp.where(m, tiled, 0)
        keep = iota_r == (w & (HRING - 1))
        hr[...] = jnp.where(keep, hr[...], 0)

    def mark(mref, pos, do):
        wi = pos >> 5
        upd = jnp.where(
            (iota_m == wi[None, :]) & do[None, :],
            jnp.ones((lanes,), I32)[None, :] << ((pos & 31)[None, :]), 0,
        )
        mref[...] = mref[...] | upd

    def write_bit_back(bit, do):
        tc = st[TCUR, :]
        wi = tc >> 5
        upd = jnp.where(
            (iotaw == wi[None, :]) & do[None, :],
            (bit & 1)[None, :] << ((tc & 31)[None, :]), 0,
        )
        tail_ref[...] = tail_ref[...] | upd
        st[TCUR, :] = tc + jnp.where(do, 1, 0)

    def write_uint_back(val, num_bits: int, do):
        """Multi-bit backward write as at most two word-level ORs (the
        value spans the word at tcur and possibly the next one)."""
        tc = st[TCUR, :]
        wi = tc >> 5
        sh = tc & 31
        v = val & ((1 << num_bits) - 1)
        lo = v << sh  # int32 wrap keeps exactly the low word's bits
        hi = jnp.where(sh == 0, 0, (v >> 1) >> (31 - sh))  # avoid shift-by-32
        upd = jnp.where(
            (iotaw == wi[None, :]) & do[None, :], lo[None, :], 0
        ) | jnp.where(
            (iotaw == wi[None, :] + 1) & do[None, :], hi[None, :], 0
        )
        tail_ref[...] = tail_ref[...] | upd
        st[TCUR, :] = tc + jnp.where(do, num_bits, 0)

    def write_uint_back_var(val, nb_vec, max_bits: int, do):
        """Variable per-lane bit count: mask the value, advance by nb_vec."""
        tc = st[TCUR, :]
        wi = tc >> 5
        sh = tc & 31
        v = val & ((1 << nb_vec) - 1)
        lo = v << sh
        hi = jnp.where(sh == 0, 0, (v >> 1) >> (31 - sh))
        upd = jnp.where(
            (iotaw == wi[None, :]) & do[None, :], lo[None, :], 0
        ) | jnp.where(
            (iotaw == wi[None, :] + 1) & do[None, :], hi[None, :], 0
        )
        tail_ref[...] = tail_ref[...] | upd
        st[TCUR, :] = tc + jnp.where(do, nb_vec, 0)

    # ---- side info (tail, backward) — bitstream_encoding.rs:77-136 --------
    on = jnp.ones((lanes,), bool)
    if nbits_bw > 0:
        write_uint_back(bandwidth, nbits_bw, on)
    lastnz_bits = int(np.ceil(np.log2(ne / 2.0)))
    write_uint_back((lastnz_trunc >> 1) - 1, lastnz_bits, on)
    write_bit_back(jnp.where(lsb_mode, 1, 0), on)
    write_uint_back(gg_ind, 8, on)
    write_bit_back(jnp.where(rc_order0 != 0, 1, 0), on)
    write_bit_back(jnp.where(rc_order1 != 0, 1, 0), num_tns == 2)
    write_bit_back(jnp.where(pitch_present, 1, 0), on)
    write_uint_back(ind_lf, 5, on)
    write_uint_back(ind_hf, 5, on)
    submode_msb = (shape_j >> 1) != 0
    write_bit_back(jnp.where(submode_msb, 1, 0), on)
    glsb_v = sum(jnp.where(shape_j == j, glsb[j], 0) for j in range(4))
    gmsb_v = sum(jnp.where(shape_j == j, gmsb[j], 0) for j in range(4))
    write_uint_back_var(gind >> glsb_v, gmsb_v, 2, on)
    write_bit_back(jnp.where(ls_inda != 0, 1, 0), on)
    nb1 = jnp.where(submode_msb, 12, 13)
    write_uint_back_var(index_joint, nb1, 13, on)
    write_uint_back_var(index_joint >> nb1, jnp.full((lanes,), 12, I32), 12, on)
    write_bit_back(jnp.where(ltpf_active != 0, 1, 0), pitch_present)
    write_uint_back_var(pitch_index, jnp.where(pitch_present, 9, 0), 9,
                        pitch_present)
    write_uint_back(noise_factor, 3, on)

    # ---- arithmetic coder (optimistic emission) ---------------------------
    def shift_state(do):
        """Reference ac_shift (bitstream_encoding.rs:397-415) minus the
        byte write: the cache/drain machinery is replaced by carried-group
        marks for the end-of-frame fix-up pass. Returns (byte, pos) for the
        caller to emit (callers batch consecutive slots into one write)."""
        low = st[LOW, :]
        carry = st[CARRY, :]
        flush = do & ((low < 0x00FF0000) | (carry == 1))
        markc = flush & (carry == 1)
        # +1 lands at the group's cache byte unless the group is headless
        # (pendings accumulated before any cache existed: cache<0 skips the
        # write in the reference, so nothing is incremented)
        mark(ms, st[RSTART, :], markc)
        mark(me, st[BP, :], markc)
        st[HL0, :] = st[HL0, :] | jnp.where(markc & (st[HASC, :] == 0), 1, 0)
        pos = st[BP, :]
        st[RSTART, :] = jnp.where(flush, pos, st[RSTART, :])
        st[HASC, :] = jnp.where(flush, 1, st[HASC, :])
        st[CARRY, :] = jnp.where(flush, 0, carry)
        st[BP, :] = pos + jnp.where(do, 1, 0)
        st[LOW, :] = jnp.where(do, (low << 8) & 0x00FFFFFF, low)
        return low >> 16, pos

    def ac_shift(do):
        byte, pos = shift_state(do)
        write_byte_at(byte, pos, do)

    def write_u16_at(v16, pos, do):
        """Two consecutive bytes as one (possibly word-spanning) ring OR."""
        wi = pos >> 2
        sh = (pos & 3) * 8
        lo = v16 << sh  # int32 wrap keeps the low word's bits
        hi = jnp.where(sh == 0, 0, (v16 >> 1) >> (31 - sh))
        wr = (wi & (HRING - 1))[None, :]
        upd = jnp.where(
            (iota_r == wr) & do[None, :], lo[None, :], 0
        ) | jnp.where(
            (iota_r == ((wi + 1) & (HRING - 1))[None, :]) & do[None, :],
            hi[None, :], 0
        )
        hr[...] = hr[...] | upd

    def ac_encode(cum_v, frq_v, do):
        r = st[RNG, :] >> 10
        low = st[LOW, :] + jnp.where(do, r * cum_v, 0)
        st[CARRY, :] = jnp.where(do & ((low >> 24) != 0), 1, st[CARRY, :])
        st[LOW, :] = low & 0x00FFFFFF
        st[RNG, :] = jnp.where(do, r * frq_v, st[RNG, :])
        # range >= 64 after one multiply: <= 2 renorms; need2 implies need1,
        # so the two slot bytes are consecutive and emit as one 16-bit write
        need1 = do & (st[RNG, :] < 0x10000)
        st[RNG, :] = jnp.where(need1, st[RNG, :] << 8, st[RNG, :])
        d1, pos1 = shift_state(need1)
        need2 = do & (st[RNG, :] < 0x10000)
        st[RNG, :] = jnp.where(need2, st[RNG, :] << 8, st[RNG, :])
        d2, _ = shift_state(need2)
        v16 = jnp.where(need1, d1 & 255, 0) | jnp.where(need2, (d2 & 255) << 8, 0)
        write_u16_at(v16, pos1, need1)

    # ---- TNS data (bitstream_encoding.rs:224-244) -------------------------
    for f in range(2):
        order = rc_order0 if f == 0 else rc_order1
        in_f = (f < num_tns) & (order > 0)
        ocum = sum(jnp.where(order == o + 1, oc[o], 0) for o in range(8))
        ofrq = sum(jnp.where(order == o + 1, of[o], 0) for o in range(8))
        ac_encode(ocum, ofrq, in_f)
        for k in range(8):
            ink = in_f & (k < order)
            rci = side_ref[18 + f * 8 + k, :]
            ccum = sum(jnp.where(rci == v, cc[k][v], 0) for v in range(17))
            cfrq = sum(jnp.where(rci == v, cf[k][v], 0) for v in range(17))
            ac_encode(ccum, cfrq, ink)
    # <= 18 TNS symbols -> <= 36 bytes -> <= 10 words: within ring capacity
    flush_head()

    # ---- spectral data (bitstream_encoding.rs:246-326) --------------------
    # xq_ref packs each tuple's two i16 lines into one i32 word (halves the
    # VMEM-resident rows, which is what bounds the lane width)
    def unpack_pair(w):
        return (w << 16) >> 16, w >> 16  # arithmetic shifts sign-extend

    def spec_tuple(p):
        n = 2 * p
        in_t = n < lastnz_trunc
        xk, xk1 = unpack_pair(xq_ref[pl.ds(p, 1), :][0, :])
        a0 = jnp.abs(xk)
        b0 = jnp.abs(xk1)
        m = jnp.maximum(a0, b0)
        g = jnp.zeros((lanes,), I32)
        for j in range(14):
            g = g + jnp.where(m >= (4 << j), 1, 0)

        def ladder_body(it, acc):
            # accumulate the ladder's tail-bit pairs in registers; the
            # tuple's single tail write happens after the signs below (tail
            # and head are independent streams, and within the tail stream
            # the order ladder-levels-ascending-then-signs is preserved)
            vacc, nacc = acc
            going = in_t & (it < g)
            lev4 = jnp.minimum(it, 3)
            pkv = pk_ref[pl.ds(lev4 * ntp + p, 1), :][0, :]
            ac_encode(pkv & 1023, pkv >> 10, going)
            to_tail = going & (~lsb_mode | (it > 0))
            bits2 = ((a0 >> it) & 1) | (((b0 >> it) & 1) << 1)
            vacc = vacc | jnp.where(to_tail, bits2 << nacc, 0)
            nacc = nacc + jnp.where(to_tail, 2, 0)
            return vacc, nacc

        # scalar trip count (batch max of g for this tuple, via SMEM): no
        # cross-lane reduction inside the loop
        z = jnp.zeros((lanes,), I32)
        vacc, nacc = jax.lax.fori_loop(0, gmax_ref[p], ladder_body, (z, z))

        pkf = pk_ref[pl.ds(4 * ntp + p, 1), :][0, :]
        ac_encode(pkf & 1023, pkf >> 10, in_t)

        # sign bits (a_lsb/b_lsb semantics: halved once in lsb mode if g>0)
        shift_lsb = lsb_mode & (g > 0)
        a_lsb = jnp.where(shift_lsb, a0 >> 1, a0)
        b_lsb = jnp.where(shift_lsb, b0 >> 1, b0)
        a_on = in_t & (a_lsb > 0)
        b_on = in_t & (b_lsb > 0)
        s_a = jnp.where(xk <= 0, 1, 0)
        s_b = jnp.where(xk1 <= 0, 1, 0)
        sv = jnp.where(a_on, s_a | jnp.where(b_on, s_b << 1, 0),
                       jnp.where(b_on, s_b, 0))
        nbv = jnp.where(a_on, 1, 0) + jnp.where(b_on, 1, 0)
        # one tail write per tuple: <= 28 ladder bits + <= 2 sign bits
        vacc = vacc | (sv << nacc)
        nacc = nacc + nbv
        write_uint_back_var(vacc, nacc, 30, nacc > 0)
        # <= 15 symbols this tuple -> <= 30 bytes -> <= 8 words advance
        flush_head()

    def spec_loop(p, _):
        spec_tuple(p)
        return 0

    # scalar dynamic bound: every lane masks tuples past its own
    # lastnz_trunc, so the batch max (fed through SMEM at gmax[ntp]) is an
    # exact trip count
    maxnt_d = gmax_ref[ntp]
    jax.lax.fori_loop(0, maxnt_d, spec_loop, 0)

    # ---- residual / lsb fill (bitstream_encoding.rs:328-352) --------------
    rng = st[RNG, :]
    log2rng = jnp.zeros((lanes,), I32)
    for i in range(1, 25):
        log2rng = log2rng + jnp.where(rng >= (1 << i), 1, 0)
    nbits_side = st[TCUR, :]
    # forecast (bitstream_encoding.rs:64-75): bp*8 + 25-log2(range) + 8 for
    # the cache + 8*carry_count. In slot terms that collapses to 8*slots +
    # 25-log2(range), except before the first shift (no cache yet) where
    # the reference still adds its unconditional cache byte.
    bp = st[BP, :]
    nbits_ari = bp * 8 + (25 - log2rng) + jnp.where(bp == 0, 8, 0)
    st[BUD, :] = jnp.maximum(0, nbits - nbits_side - nbits_ari)

    # non-lsb: first min(budget, n_residual) bits in nonzero-line order
    st[CNT, :] = jnp.zeros((lanes,), I32)
    res_limit = jnp.minimum(st[BUD, :], n_residual)

    def res_chunk(ci, _):
        # accumulate up to 16 lines' bits into one word write; dropped
        # (over-limit) bits never shift later positions because the limit
        # never recovers. res_ref packs 32 line bits per word, so a 16-line
        # chunk reads one half-word; xq pairs come 2 lines per word.
        v = jnp.zeros((lanes,), I32)
        rank = jnp.zeros((lanes,), I32)
        rw = res_ref[pl.ds(ci >> 1, 1), :][0, :]
        rsh = (ci & 1) * 16
        for j2 in range(8):
            w = xq_ref[pl.ds(ci * 8 + j2, 1), :][0, :]
            xa, xb = unpack_pair(w)
            for half, xv in ((0, xa), (1, xb)):
                j = 2 * j2 + half
                rb = (rw >> (rsh + j)) & 1
                can = (
                    ~lsb_mode & (xv != 0)
                    & (st[CNT, :] + rank < res_limit)
                )
                v = v | jnp.where(can, rb << rank, 0)
                rank = rank + jnp.where(can, 1, 0)
        write_uint_back_var(v, rank, 16, rank > 0)
        st[CNT, :] = st[CNT, :] + rank
        return 0

    # residual bits only come from nonzero lines, all below lastnz_trunc
    jax.lax.fori_loop(
        0, jnp.minimum((maxnt_d * 2 + 15) >> 4, ne // 16), res_chunk, 0
    )
    for line_ in range((ne // 16) * 16, ne, 2):
        wa_, wb_ = unpack_pair(xq_ref[line_ >> 1, :])
        rw_ = res_ref[line_ >> 5, :]
        for half, xv_ in ((0, wa_), (1, wb_)):
            line = line_ + half
            rb_ = (rw_ >> (line & 31)) & 1
            can_ = ~lsb_mode & (xv_ != 0) & (st[CNT, :] < res_limit)
            write_bit_back(rb_, can_)
            st[CNT, :] = st[CNT, :] + jnp.where(can_, 1, 0)

    # lsb mode: replay the ladder arithmetic to regenerate the lsb queue in
    # order, writing the first `budget` values (pure elementwise per tuple)
    st[CNT, :] = jnp.zeros((lanes,), I32)

    def lsb_tuple(p, _):
        n = 2 * p
        xk, xk1 = unpack_pair(xq_ref[pl.ds(p, 1), :][0, :])
        a0 = jnp.abs(xk)
        b0 = jnp.abs(xk1)
        # ladder depth g: number of halvings until max < 4
        g = jnp.zeros((lanes,), I32)
        for j in range(14):
            g = g + jnp.where(jnp.maximum(a0, b0) >= (4 << j), 1, 0)
        pair_on = lsb_mode & (n < lastnz_trunc) & (g > 0)
        a_lsb = a0 >> 1
        b_lsb = b0 >> 1

        # accumulate the <= 4 queued bits in registers and write once: CNT
        # counts QUEUED bits (budget cutoff is on queue order), the write
        # cursor advances only by WRITTEN bits — mirrored exactly here
        vacc = jnp.zeros((lanes,), I32)
        nacc = jnp.zeros((lanes,), I32)
        q = jnp.zeros((lanes,), I32)
        for val, do in (
            (a0 & 1, pair_on),
            (jnp.where(xk > 0, 0, 1), pair_on & (a_lsb == 0) & (xk != 0)),
            (b0 & 1, pair_on),
            (jnp.where(xk1 > 0, 0, 1), pair_on & (b_lsb == 0) & (xk1 != 0)),
        ):
            can = do & (st[CNT, :] + q < st[BUD, :])
            vacc = vacc | jnp.where(can, val << nacc, 0)
            nacc = nacc + jnp.where(can, 1, 0)
            q = q + jnp.where(do, 1, 0)
        st[CNT, :] = st[CNT, :] + q
        write_uint_back_var(vacc, nacc, 4, nacc > 0)
        return 0

    # gmax[ntp+1] is 0 when no lane in the batch is in lsb_mode: the whole
    # replay loop drops out
    jax.lax.fori_loop(0, gmax_ref[ntp + 1], lsb_tuple, 0)

    # ---- ac_finish (bitstream_encoding.rs:354-395) ------------------------
    rng = st[RNG, :]
    bits = jnp.full((lanes,), 24, I32)
    for i in range(1, 25):
        bits = bits - jnp.where(rng >= (1 << i), 1, 0)
    # bits = 24 - floor(log2(range)): smallest b with (range >> (24-b)) != 0
    low = st[LOW, :]
    mask = jnp.right_shift(jnp.full((lanes,), 0x00FFFFFF, I32), bits)
    val = low + mask
    over1 = val >> 24
    high = low + rng
    over2 = high >> 24
    val = val & (0x00FFFFFF & ~mask)
    same = over1 == over2
    need_extra = same & ((val + mask) >= high)
    bits = bits + jnp.where(need_extra, 1, 0)
    mask = jnp.where(need_extra, mask >> 1, mask)
    val = jnp.where(need_extra, ((low + mask) & 0x00FFFFFF) & ~mask, val)
    st[CARRY, :] = jnp.where(same & (val < low), 1, st[CARRY, :])
    st[LOW, :] = val
    # while bits > 0: ac_shift(); bits -= 8   (at most 4 rounds; bits <= 25)
    brem = bits
    for _ in range(4):
        ac_shift(brem > 0)
        brem = brem - jnp.where(brem > 0, 8, 0)
    flush_head()  # drain before the direct head_ref partial-byte clear
    bits_fin = ((bits - 1) % 8) + 1  # value of `bits` after the loop, +8

    # the last slot is written as a partial byte: only its top bits_fin
    # bits belong to the head stream (the rest meet the backward tail), so
    # clear the optimistic write's low bits
    pos = st[BP, :] - 1  # bits >= 1 forces at least one shift: BP >= 1
    clr = jnp.right_shift(jnp.full((lanes,), 0xFF, I32), bits_fin)
    wi = pos >> 2
    clear_upd = jnp.where(
        iotaw == wi[None, :], clr[None, :] << (((pos & 3) * 8)[None, :]), 0
    )
    head_ref[...] = head_ref[...] & ~clear_upd

    # ---- carried-group fix-ups (disjoint; see module docstring) -----------
    open_g = jnp.zeros((lanes,), I32)
    hl0 = st[HL0, :] > 0
    for p in range(min(nbytes, nwp * 4)):
        s_p = (ms[p >> 5, :] >> (p & 31)) & 1
        e_p = (me[p >> 5, :] >> (p & 31)) & 1
        open_g = jnp.where(e_p > 0, 0, open_g)
        start = s_p > 0
        # headless first group: position 0 is itself a pending byte — the
        # reference skips the cache write entirely, so clear, don't +1
        if p == 0:
            inc = start & ~hl0
            clear_here = start & hl0
        else:
            inc = start
            clear_here = open_g > 0
        wrow = p >> 2
        sh = (p & 3) * 8
        keep = (~(255 << sh)) & 0xFFFFFFFF
        keep = keep - 2 ** 32 if keep >= 2 ** 31 else keep  # signed i32
        w = head_ref[wrow, :]
        cur = (w >> sh) & 255
        newb = jnp.where(inc, (cur + 1) & 255, cur)
        newb = jnp.where(clear_here, 0, newb)
        w2 = (w & keep) | (newb << sh)
        head_ref[wrow, :] = jnp.where(inc | clear_here, w2, w)
        open_g = jnp.where(start, 1, open_g)


def _run_pack_kernel(cfg: Lc3Config, nbytes: int, xq_t, res_t, side_rows,
                     pk_rows, gmax, interpret: bool = False,
                     lanes: int | None = None):
    ne = cfg.ne
    S = xq_t.shape[1]
    nbits = nbytes * 8
    fs_ind = cfg.fs_ind
    is_7p5 = cfg.n_ms == FrameDuration.MS7P5
    lpcw = 1 if nbits < (360 if is_7p5 else 480) else 0
    nbits_bw = [0, 1, 2, 2, 3][fs_ind]

    nw = -(-nbytes // 4)
    nwp = -(-nw // 8) * 8
    nqp = xq_t.shape[0]  # packed i16-pair rows (ne/2, padded)
    nrp = res_t.shape[0]  # packed residual-bit words (ne/32, padded)
    ntp = pk_rows.shape[0] // 5

    # carried-group mark words span byte positions <= BP <= nbytes plus the
    # finish shifts; round rows up to the sublane tile
    mrows = -(-(nbytes + 10) // 32)
    mrows = -(-mrows // 8) * 8

    # Lane width: wider is faster (512 -> 1024 was 0.512 -> 0.358 ms at
    # S=2048/150 B and 2.955 -> 2.171 ms at 400 B: per-row issue latency
    # amortizes over more lanes). After the round-4 VMEM diet (i16-pair xq
    # packing, 32-bit residual words, register-accumulated tail writes),
    # 1024 lanes compiles and runs at the binding worst case — ne=400 with
    # nbytes=400 (nwp=104) — and everything smaller, verified by a
    # compile-probe grid over the geometry matrix on TPU v5e. The old
    # (rows + 51*nwp)-words analytic estimate over-predicted Mosaic's
    # scoped-vmem demand ~2x at large nwp and cost 27% at the 400 B edge.
    # 2048 lanes measured 24% SLOWER than 1024 (0.372 -> 0.460 ms at
    # 150B/S=2048) — unlike parse/bitmodel this kernel stops scaling, so
    # the cap stays 1024 on the probed generation (512 on unprobed ones —
    # see lanecaps.lane_cap).
    if lanes is None:
        from ..lanecaps import lane_cap

        cap = lane_cap("pack")
        lanes = 128
        while lanes < cap and S % (lanes * 2) == 0:
            lanes *= 2

    head_t, tail_t = pl.pallas_call(
        partial(_pack_kernel, ne, nbytes, nwp, ntp, lanes, lpcw, nbits_bw,
                mrows),
        out_shape=(
            jax.ShapeDtypeStruct((nwp, S), I32),
            jax.ShapeDtypeStruct((nwp, S), I32),
        ),
        grid=(S // lanes,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nqp, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nrp, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((40, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((5 * ntp, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nwp, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nwp, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((16, lanes), I32),  # state rows
            pltpu.VMEM((mrows, lanes), I32),  # carried-group start marks
            pltpu.VMEM((mrows, lanes), I32),  # carried-group end marks
            pltpu.VMEM((HRING, lanes), I32),  # head emission ring
        ],
        interpret=interpret,
    )(gmax, xq_t, res_t, side_rows, pk_rows)
    return head_t, tail_t


def device_pack(cfg: Lc3Config, nbytes: int, fields: dict,
                interpret: bool = False, lanes: int | None = None) -> jax.Array:
    """Encoder fields (encode_step(..., emit_pack=True) output, device
    arrays) -> uint8 frames [S, nbytes], entirely on device. S must be a
    multiple of 128. Requires fields["quant_pack_tables"] (or
    fields["pack_tables"]): the range-coder operands precomputed by the
    bit-model pass."""
    ne = cfg.ne
    NT = ne // 2
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        raise NotImplementedError(
            "device_pack is a TPU (Mosaic) kernel with no CPU formulation; "
            "use interpret=True (tests) or the host packers "
            "(coding.host.pack_frames / coding.native.pack_frames_native)"
        )
    xq = fields["x_q"].astype(I32)
    S = xq.shape[0]
    assert S % 128 == 0, "pad the stream axis to a multiple of 128"
    pk_rows = fields.get("quant_pack_tables", fields.get("pack_tables"))
    assert pk_rows is not None, \
        "device_pack needs pack_tables: run encode_step with emit_pack=True"
    # VMEM diet (lane width is VMEM-bound): pack each tuple's two i16 lines
    # into one i32 word [S, ne/2] and the residual bits 32-per-word
    # [S, ceil(ne/32)] — ~600 fewer resident rows per lane block at ne=400.
    # INVARIANT: the i16-pair packing requires x_q in [-32768, 32767].
    # That holds because spectral_quantize clips to exactly that range
    # (dsp/encoder.py quant_only, mirroring the reference's
    # global_gain_limitation, spectral_quantization.rs:212-228) — if the
    # quantizer's clip ever widens, this packing silently corrupts frames;
    # see the matching comment at the clip site.
    nqp = -(-NT // 8) * 8
    xqp = (xq[:, 1::2] << 16) | (xq[:, 0::2] & 0xFFFF)
    xq_t = jnp.pad(xqp, ((0, 0), (0, nqp - NT))).T
    nrw = -(-ne // 32)
    nrp = -(-nrw // 8) * 8
    resb = jnp.pad(fields["residual_bits"].astype(I32) & 1,
                   ((0, 0), (0, 32 * nrw - ne))).reshape(S, nrw, 32)
    resw = jnp.sum(resb << jnp.arange(32, dtype=I32)[None, None, :], axis=2)
    res_t = jnp.pad(resw, ((0, 0), (0, nrp - nrw))).T

    # per-tuple batch max of the escape-ladder depth -> SMEM scalar bounds;
    # slot [ntp] carries the batch max tuple count (lastnz_trunc / 2)
    pairs = jnp.abs(xq).reshape(S, NT, 2)
    m = jnp.maximum(pairs[:, :, 0], pairs[:, :, 1])
    g = jnp.sum(
        m[:, :, None] >= jnp.asarray(4 << np.arange(14))[None, None, :], axis=2
    ).astype(I32)
    ntp = pk_rows.shape[0] // 5
    maxnt = jnp.minimum(
        (jnp.max(jnp.asarray(fields["quant_lastnz_trunc"], I32)) + 1) >> 1,
        ntp,
    )
    lsb_bound = jnp.where(
        jnp.any(jnp.asarray(fields["quant_lsb_mode"], bool)), maxnt, 0
    )
    gmax = jnp.concatenate(
        [jnp.pad(jnp.max(g, axis=0), (0, ntp - NT)),
         maxnt[None], lsb_bound[None].astype(I32),
         jnp.zeros((6,), I32)]
    )

    def row(v):
        return jnp.broadcast_to(jnp.asarray(v, I32), (S,))

    side_rows = jnp.stack(
        [
            row(fields["quant_lastnz_trunc"]),
            row(fields["quant_lsb_mode"]),
            row(fields["quant_gg_ind"]),
            row(fields["tns_num_tns_filters"]),
            row(fields["tns_rc_order"][:, 0]),
            row(fields["tns_rc_order"][:, 1]),
            row(fields["ltpf_pitch_present"]),
            row(fields["ltpf_ltpf_active"]),
            row(fields["ltpf_pitch_index"]),
            row(fields["sns_ind_lf"]),
            row(fields["sns_ind_hf"]),
            row(fields["sns_shape_j"]),
            row(fields["sns_gind"]),
            row(fields["sns_ls_inda"]),
            row(fields["sns_index_joint_j"]),
            row(fields["bandwidth"]),
            row(fields["noise_factor"]),
            row(fields["n_residual"]),
        ]
        + [row(fields["tns_rc_i"][:, k]) for k in range(16)]
        + [jnp.zeros((S,), I32)] * 6  # pad rows to 40
    )

    head_t, tail_t = _run_pack_kernel(cfg, nbytes, xq_t, res_t, side_rows,
                                      pk_rows, gmax, interpret=interpret,
                                      lanes=lanes)
    # unpack words -> bytes, reverse the tail stream, OR the two halves
    nw = -(-nbytes // 4)

    def words_to_bytes(w_t):
        w = w_t[:nw].T  # [S, nw]
        b = jnp.stack(
            [(w >> (8 * i)) & 255 for i in range(4)], axis=2
        ).reshape(S, nw * 4)
        return b[:, :nbytes]

    head_b = words_to_bytes(head_t)
    tail_b = words_to_bytes(tail_t)[:, ::-1]
    return (head_b | tail_b).astype(jnp.uint8)


def encode_bytes_step(cfg: Lc3Config, nbytes: int, state, pcm,
                      interpret: bool = False, lanes: int | None = None):
    """Fully fused on-device encode: PCM [S, nf] -> frame bytes [S, nbytes].

    interpret=True runs the pack kernel through the Pallas interpreter
    (CPU meshes: multi-device evidence in __graft_entry__.dryrun_multichip
    and tests; the analysis DSP takes its XLA formulations there) and
    returns (state, payload, fields) instead of (state, payload): the
    fields MUST be live outputs of the enclosing jit. On TPU the Mosaic
    pallas_calls are opaque boundaries — every field materializes exactly
    once before entering a kernel — but the interpreted kernel body is
    plain traced ops, and XLA CPU then duplicates shared float producers
    (gg, shaped-spectrum chains) into different fusions with different
    fma-contraction choices, leaving e.g. x_q inconsistent with the
    bit-model's emitted (cum,freq) operands. Measured round 5 at
    8 k/7.5 ms/40 B: with fields dead, all 128 streams produced frames
    that DECODE TO GARBAGE (A-vs-B PCM SNR down to -8.6 dB); with fields
    exported, byte-exact vs the host packer. lax.optimization_barrier
    does not survive XLA's simplifier (CLAUDE.md round-3 finding), so
    output-liveness is the one robust pin. Callers must keep the returned
    fields alive through their jit boundary (dropping them afterwards on
    the host is fine)."""
    from ..dsp.encoder import encode_step

    state, fields = encode_step(cfg, nbytes, state, pcm, emit_pack=True)
    payload = device_pack(cfg, nbytes, fields, interpret=interpret,
                          lanes=lanes)
    if interpret:
        return state, payload, fields
    return state, payload
