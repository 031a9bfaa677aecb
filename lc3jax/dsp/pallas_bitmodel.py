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


def _bitmodel_tables(rate_flag: int):
    """Bake the spec tables for one rate_flag as matmul-ready constants.

    One [24, 256] table drives the first one-hot matmul (its M dim pads to
    128 on the MXU, so the extra rows are free): rows 0..7 are the pki model
    indices per (hi, L), rows 8..15 / 16..23 the hi/lo bytes of the escape
    cost E[pki] pre-composed through the lookup — this keeps the per-level
    escape lookups out of the VPU entirely."""
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
    lut24 = np.zeros((24, 256), np.float32)
    lut24[0:8] = pki
    lut24[8:16] = esc // 256
    lut24[16:24] = esc % 256
    # BITS byte-split, transposed: rows 0..16 hi byte, 17..33 lo byte
    bt = np.zeros((48, 64), np.float32)
    bt[0:17] = (bits // 256).T
    bt[17:34] = (bits % 256).T
    return lut24, bt.astype(np.float32)


def _kernel(nt: int, ne4: int, lanes: int, lut24_ref, bitsT_ref, c_ref,
            g_ref, sym_ref, out_ref):
    lut24 = lut24_ref[...].astype(BF16)  # [24, 256]
    bitsT = bitsT_ref[0:34, :].astype(BF16)  # [34, 64]
    iota256 = jax.lax.broadcasted_iota(jnp.int32, (256, lanes), 0)
    iota64 = jax.lax.broadcasted_iota(jnp.int32, (64, lanes), 0)
    iota17 = jax.lax.broadcasted_iota(jnp.int32, (17, lanes), 0)

    def body(n, _):
        cv = c_ref[n, :]  # [128] int32 in [0, 256)
        gv = g_ref[n, :].astype(F32)  # ladder depth 0..14
        sv = sym_ref[n, :]  # final symbol 0..16

        ohc = (iota256 == cv[None, :]).astype(BF16)  # [256, 128]
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
        ohp = (iota64 == pki_fin[None, :].astype(jnp.int32)).astype(BF16)  # [64,128]
        bhl = jax.lax.dot_general(
            bitsT, ohp, (((1,), (0,)), ((), ())), preferred_element_type=F32
        )  # [34, 128]
        brow = bhl[0:17, :] * F32(256.0) + bhl[17:34, :]  # exact ints < 2^16
        fin = jnp.sum(jnp.where(iota17 == sv[None, :], brow, 0.0), axis=0)

        out_ref[n, :] = esc_part + fin
        return 0

    jax.lax.fori_loop(0, nt, body, 0)


def bitmodel_table_part(c, g, sym, rate_flag: int, ne: int,
                        interpret: bool = False):
    """Per-tuple table bits (escape ladder + final symbol), [S, NT] f32.

    c: context in [0,256); g: ladder depth; sym: final symbol in [0,16].
    All [S, NT] int32. S must be a multiple of 128. Exact integers in f32.
    """
    S, NT = c.shape
    assert S % LANES == 0, "pad the stream axis to a multiple of 128"
    lut24, bitsT = _bitmodel_tables(rate_flag)
    nt_pad = -(-NT // 8) * 8
    if nt_pad != NT:
        padr = ((0, 0), (0, nt_pad - NT))
        c = jnp.pad(c, padr)
        g = jnp.pad(g, padr)
        sym = jnp.pad(sym, padr)
    # hi flag boundary: positions with 2p <= ne/2 use the low table half
    ne4 = ne // 4
    # wide lane blocks amortize the per-row issue latency (measured on v5e:
    # 128 lanes -> 0.83 ms, 1024 lanes -> 0.20 ms at S=2048, NT=200); cap so
    # the working set (4 [NT, LW] i32/f32 blocks + the [256, LW] one-hot)
    # stays well inside VMEM
    lanes = LANES
    while (lanes < 1024 and S % (lanes * 2) == 0
           and (nt_pad * 4 + 256) * 2 * lanes * 2 * 4 < 2 ** 23):
        lanes *= 2

    out_t = pl.pallas_call(
        partial(_kernel, nt_pad, ne4, lanes),
        out_shape=jax.ShapeDtypeStruct((nt_pad, S), F32),
        grid=(S // lanes,),
        in_specs=[
            pl.BlockSpec((24, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((48, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt_pad, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt_pad, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt_pad, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nt_pad, lanes), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(lut24), jnp.asarray(bitsT), c.T, g.T, sym.T)
    return out_t[:NT].T
