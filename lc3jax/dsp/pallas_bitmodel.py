"""Pallas TPU kernel: arithmetic-coder bit-model table lookups.

The spectral bit-consumption model (encoder/spectral_quantization.rs:265-348)
needs, per spectral tuple, AC_SPEC table values selected by a data-dependent
context: escape costs BITS[pki(c,hi,L), 16] for each ladder level L and the
final-symbol cost BITS[pki(c,hi,lev), sym]. As plain XLA the only gather-free
formulation is a one-hot matmul whose [S, NT, 256] one-hot and [S, NT, 68]
result round-trip through HBM (~320 MB/step at S=2048) — that made the bit
model the encoder's hottest op (~1.2 ms, run twice per quantize).

This kernel keeps everything in VMEM: streams ride the 128-lane axis, the
row loop walks tuples, and the two table lookups are small one-hot MXU
matmuls ([8,256]@[256,128] for the pki rows, [34,64]@[64,128] byte-split for
the BITS row) built and consumed on-chip. Only the [NT, S] f32 result ever
touches HBM. All values are integers < 2^24 carried in f32 (one-hot matmuls
with byte-valued tables are exact), so the output is bit-identical to the
XLA path — asserted in tests/test_pallas_bitmodel.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tables as T

F32 = jnp.float32
BF16 = jnp.bfloat16
LANES = 128


def _bitmodel_tables(rate_flag: int, emit_pack: bool = False):
    """Bake the spec tables for one rate_flag as matmul-ready constants.

    One [24, 256] table drives the first one-hot matmul (its M dim pads to
    128 on the MXU, so the extra rows are free): rows 0..7 are the pki model
    indices per (hi, L), rows 8..15 / 16..23 the hi/lo bytes of the escape
    cost E[pki] pre-composed through the lookup — this keeps the per-level
    escape lookups out of the VPU entirely.

    With emit_pack the tables grow (still inside the free 128-row MXU pad)
    so the same one-hots also fetch the range-*encoder* operands: rows
    24..55 are the escape symbol's cum/freq hi/lo bytes per (hi, L)
    (AC_SPEC_CUMFREQ/FREQ[pki, 16]), and the second table gains the full
    byte-split CUMFREQ rows 34..67 for the final-symbol cum/freq."""
    lut = np.asarray(T.AC_SPEC_LOOKUP, np.int64)  # [4096]
    bits = np.asarray(T.AC_SPEC_BITS, np.int64)  # [64, 17]
    # pki[hi*4+L, c] = AC_SPEC_LOOKUP[c + rate + hi*256 + L*1024], c in [0,256)
    idx = (
        np.arange(256)[None, :]
        + rate_flag
        + (np.arange(8)[:, None] // 4) * 256
        + (np.arange(8)[:, None] % 4) * 1024
    )
    pki = lut[idx]  # [8, 256]
    esc = bits[:, 16][pki]  # [8, 256] escape-symbol cost per (hi, L)
    nrow = 56 if emit_pack else 24
    lut24 = np.zeros((nrow, 256), np.float32)
    lut24[0:8] = pki
    lut24[8:16] = esc // 256
    lut24[16:24] = esc % 256
    # BITS byte-split, transposed: rows 0..16 hi byte, 17..33 lo byte
    bt = np.zeros((68 if emit_pack else 48, 64), np.float32)
    bt[0:17] = (bits // 256).T
    bt[17:34] = (bits % 256).T
    if emit_pack:
        cum = np.asarray(T.AC_SPEC_CUMFREQ, np.int64)  # [64, 17]
        frq = np.asarray(T.AC_SPEC_FREQ, np.int64)
        lut24[24:32] = cum[:, 16][pki] // 256
        lut24[32:40] = cum[:, 16][pki] % 256
        lut24[40:48] = frq[:, 16][pki] // 256
        lut24[48:56] = frq[:, 16][pki] % 256
        bt[34:51] = (cum // 256).T
        bt[51:68] = (cum % 256).T
    return lut24, bt.astype(np.float32)


def _kernel(nt: int, ne4: int, lanes: int, emit_pack: bool, maxnt_ref, *refs):
    if emit_pack:
        lut24_ref, bitsT_ref, c_ref, g_ref, sym_ref, out_ref, pk_ref = refs
        lut24 = lut24_ref[...].astype(BF16)  # [56, 256]
        bitsT = bitsT_ref[0:68, :].astype(BF16)  # [68, 64]
    else:
        lut24_ref, bitsT_ref, c_ref, g_ref, sym_ref, out_ref = refs
        lut24 = lut24_ref[...].astype(BF16)  # [24, 256]
        bitsT = bitsT_ref[0:34, :].astype(BF16)  # [34, 64]
    # NOTE: the one-hot build must stay exactly `(iota == v).astype(BF16)`:
    # Mosaic neither lowers bf16 vector compares (arith.cmpf on bf16) nor
    # relayouts the i1 mask of an i32 compare into a bf16-valued select
    # (i1 tiling (8,128) vs (16,128)) — both "cheaper" formulations fail
    # to compile on real TPU while passing in interpret mode
    iota256 = jax.lax.broadcasted_iota(jnp.int32, (256, lanes), 0)
    iota64 = jax.lax.broadcasted_iota(jnp.int32, (64, lanes), 0)
    iota17 = jax.lax.broadcasted_iota(jnp.int32, (17, lanes), 0)
    # rows beyond the batch's last coded tuple are never consumed (masked by
    # in_range downstream) but must be defined
    out_ref[...] = jnp.zeros((nt, lanes), F32)
    if emit_pack:
        pk_ref[...] = jnp.zeros((5 * nt, lanes), jnp.int32)

    def body(n, _):
        cv = c_ref[n, :]  # [128] int32 in [0, 256)
        gv = g_ref[n, :].astype(F32)  # ladder depth 0..14
        sv = sym_ref[n, :]  # final symbol 0..16

        ohc = (iota256 == cv[None, :]).astype(BF16)  # [256, lanes]
        m2 = jax.lax.dot_general(
            lut24, ohc, (((1,), (0,)), ((), ())), preferred_element_type=F32
        )  # [24, 128]: rows 0..7 pki, 8..15 esc hi byte, 16..23 esc lo byte
        hi = n > ne4  # rows are (hi*4 + L)
        pki = jnp.where(hi, m2[4:8, :], m2[0:4, :])  # [4, 128] f32 ints
        esc = jnp.where(hi, m2[12:16, :], m2[8:12, :]) * F32(256.0) + jnp.where(
            hi, m2[20:24, :], m2[16:20, :]
        )  # [4, 128] exact escape costs per level

        # escape-ladder bits: level L contributes BITS[pki_L, 16] while the
        # ladder is still running; beyond L=3 the row saturates at pki_3
        esc_part = (
            jnp.where(gv > 0.0, esc[0, :], 0.0)
            + jnp.where(gv > 1.0, esc[1, :], 0.0)
            + jnp.where(gv > 2.0, esc[2, :], 0.0)
            + jnp.maximum(gv - 3.0, 0.0) * esc[3, :]
        )

        # final-symbol bits: BITS[pki_{min(g,3)}, sym]
        lev = jnp.minimum(gv, 3.0)
        pki_fin = jnp.where(
            lev == 0.0, pki[0, :],
            jnp.where(lev == 1.0, pki[1, :], jnp.where(lev == 2.0, pki[2, :], pki[3, :])),
        )
        ohp = (iota64 == pki_fin[None, :].astype(jnp.int32)).astype(BF16)
        bhl = jax.lax.dot_general(
            bitsT, ohp, (((1,), (0,)), ((), ())), preferred_element_type=F32
        )  # [34, 128]
        brow = bhl[0:17, :] * F32(256.0) + bhl[17:34, :]  # exact ints < 2^16
        fin = jnp.sum(jnp.where(iota17 == sv[None, :], brow, 0.0), axis=0)

        out_ref[n, :] = esc_part + fin

        if emit_pack:
            # range-encoder operands off the same one-hots, packed
            # cum | frq << 10 (all < 2^21: exact in f32)
            esc_cum = jnp.where(hi, m2[28:32, :], m2[24:28, :]) * F32(256.0) \
                + jnp.where(hi, m2[36:40, :], m2[32:36, :])
            esc_frq = jnp.where(hi, m2[44:48, :], m2[40:44, :]) * F32(256.0) \
                + jnp.where(hi, m2[52:56, :], m2[48:52, :])
            for lv in range(4):
                pk_ref[lv * nt + n, :] = (
                    esc_cum[lv, :] + esc_frq[lv, :] * F32(1024.0)
                ).astype(jnp.int32)
            crow = bhl[34:51, :] * F32(256.0) + bhl[51:68, :]  # [17, L] cum
            # the final symbol is a_f + 4*b_f <= 15, so sym+1 <= 16 is a
            # valid cumfreq column (escape sym 16 never reaches here)
            cum_v = jnp.sum(jnp.where(iota17 == sv[None, :], crow, 0.0), axis=0)
            nxt = jnp.sum(jnp.where(iota17 == sv[None, :] + 1, crow, 0.0), axis=0)
            pk_ref[4 * nt + n, :] = (
                cum_v + (nxt - cum_v) * F32(1024.0)
            ).astype(jnp.int32)
        return 0

    # scalar dynamic bound: tuples past the batch max of lastnz contribute
    # nothing (est is masked by in_range, pack rows are read only below
    # lastnz_trunc), so don't walk them
    jax.lax.fori_loop(0, maxnt_ref[0], body, 0)


def bitmodel_table_part(c, g, sym, rate_flag: int, ne: int,
                        interpret: bool = False, emit_pack: bool = False,
                        lastnz=None, lanes: int | None = None):
    """Per-tuple table bits (escape ladder + final symbol), [S, NT] f32.

    c: context in [0,256); g: ladder depth; sym: final symbol in [0,16].
    All [S, NT] int32. S must be a multiple of 128. Exact integers in f32.

    emit_pack additionally returns the range-encoder operands for the same
    tuples as a [5*nt_pad, S] int32 array in the pack kernel's layout:
    rows L*nt_pad+n the escape (cum + freq*1024) at ladder level L, rows
    4*nt_pad+n the final symbol's (cum + freq*1024). The fetches ride the
    one-hot matmuls this kernel already builds, so the device range encoder
    (coding/pallas_pack.py) needs no table lookups of its own."""
    S, NT = c.shape
    assert S % LANES == 0, "pad the stream axis to a multiple of 128"
    lut24, bitsT = _bitmodel_tables(rate_flag, emit_pack)
    nt_pad = -(-NT // 8) * 8
    if nt_pad != NT:
        padr = ((0, 0), (0, nt_pad - NT))
        c = jnp.pad(c, padr)
        g = jnp.pad(g, padr)
        sym = jnp.pad(sym, padr)
    # hi flag boundary: positions with 2p <= ne/2 use the low table half
    ne4 = ne // 4
    # wide lane blocks amortize the per-row issue latency (measured on v5e
    # at S=2048, NT=200: 256 lanes 0.574/0.661 ms, 512 0.305/0.363, 1024
    # 0.197/0.263 plain/emit_pack — tools/kernel_bench.py). Lane picker:
    # widest lane count dividing S, up to 2048 — compile-probed on v5e at
    # the worst case (NT=200, S=2048): 2048 lanes compiles in both modes
    # and measures 0.149/0.223 ms plain/emit_pack vs 0.196/0.262 at 1024
    # (-24%/-15%, device clock, bit-identical output). The old analytic
    # VMEM estimate predicted emit_pack at 2048 would not fit; like the
    # parse/pack pickers it over-predicted Mosaic's real demand — probe,
    # don't estimate (CLAUDE.md round-4 lane-picker lesson). Unprobed TPU
    # generations cap at 512 (lanecaps.lane_cap).
    if lanes is None:
        from ..lanecaps import lane_cap

        cap = lane_cap("bitmodel")
        lanes = LANES
        while lanes < cap and S % (lanes * 2) == 0:
            lanes *= 2

    if lastnz is None:
        maxnt = jnp.full((8,), nt_pad, jnp.int32)
    else:
        maxnt = jnp.full(
            (8,),
            jnp.minimum((jnp.max(lastnz) + 1) >> 1, nt_pad).astype(jnp.int32),
        )

    out_shape = [jax.ShapeDtypeStruct((nt_pad, S), F32)]
    out_specs = [
        pl.BlockSpec((nt_pad, lanes), lambda i: (0, i),
                     memory_space=pltpu.VMEM)
    ]
    if emit_pack:
        out_shape.append(jax.ShapeDtypeStruct((5 * nt_pad, S), jnp.int32))
        out_specs.append(
            pl.BlockSpec((5 * nt_pad, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
        )
    outs = pl.pallas_call(
        partial(_kernel, nt_pad, ne4, lanes, emit_pack),
        out_shape=tuple(out_shape) if emit_pack else out_shape[0],
        grid=(S // lanes,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(lut24.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bitsT.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt_pad, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt_pad, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt_pad, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs) if emit_pack else out_specs[0],
        interpret=interpret,
    )(maxnt, jnp.asarray(lut24), jnp.asarray(bitsT), c.T, g.T, sym.T)
    if emit_pack:
        return outs[0][:NT].T, outs[1]
    return outs[:NT].T
