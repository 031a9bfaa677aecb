"""Pallas TPU kernel: both LTPF synthesis filter passes in VMEM.

The XLA lax.scan formulation of the blocked LTPF IIR (ltpf.py) carries two
[S, H+nf] f32 buffers through a 30-iteration while loop; at S >= 8192 they
spill VMEM and every per-block funnel slab streams from HBM (~3 ms at
S=8192, ~9.5 ms at S=16384 — device traces). This kernel keeps the whole
working set in VMEM scratch per 256-stream grid block and unrolls the
block loop, so the funnel shifter's selects run at vector-unit speed and
the only HBM traffic is the kernel I/O.

Streams ride the sublane axis ([SB, time] blocks); per-stream funnel
offsets broadcast along lanes. Pass A (fade-out, previous coefficients)
and pass B (final output, per-position scratch/x numerator selection for
the case-5 fade-in) run back to back, sharing the y scratch buffer: pass B
never reads positions it has not written except through zero denominator
coefficients (inactive streams), exactly like the zero-initialized XLA
path, where any finite stale value is annihilated.

Reference: decoder/long_term_post_filter.rs:318-396 (via ltpf.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
SB = 256  # streams per grid block (sublane axis)


def _funnel(slab, off, width: int):
    """w[s, j] = slab[s, off_s + j]; off [SB, 1] int32, slab [SB, sw]."""
    sw = slab.shape[1]
    nbits = max(1, (sw - width).bit_length())
    cur = slab
    for b in reversed(range(nbits)):
        step = 1 << b
        need = min(cur.shape[1], (step - 1) + width)
        lo = cur[:, :need]
        if step + need <= cur.shape[1]:
            hi = cur[:, step : step + need]
        else:
            pad = step + need - cur.shape[1]
            hi = jnp.pad(cur[:, step:], ((0, 0), (0, pad)))
        bit = ((off >> b) & 1) != 0  # [SB, 1]
        cur = jnp.where(bit, hi, lo)
        off = off - jnp.where(bit, step, 0)
    return cur


def _ltpf_kernel(H, nf, B, l_num, l_den, rb,
                 xcat_ref, hist_ref, cna_ref, cda_ref, offa_ref,
                 cnb_ref, cdb_ref, offb_ref, fd_ref, fb_ref, sel_ref,
                 ya_ref, yb_ref, ycat, sbuf):
    nblocks = nf // B
    W = B + l_den

    ycat[:, :H] = hist_ref[...]
    ycat[:, H:] = jnp.zeros((SB, nf + l_den), F32)
    offa = offa_ref[...]
    offb = offb_ref[...]

    def fir(coef_ref, win, l):
        acc = coef_ref[:, 0:1] * win[:, l : l + B]
        for k in range(1, l + 1):
            acc = acc + coef_ref[:, k : k + 1] * win[:, l - k : l - k + B]
        return acc

    # ---- pass A: fade-out with previous coefficients
    for bi in range(nblocks):
        q = H + bi * B
        num = fir(cna_ref, xcat_ref[:, q - l_num : q + B], l_num)
        w = _funnel(ycat[:, q - rb : q + B + l_den], offa, W)
        den = fir(cda_ref, w, l_den)
        fd = fd_ref[0:1, bi * B : (bi + 1) * B]
        ycat[:, q : q + B] = xcat_ref[:, q : q + B] - fd * (num - den)
    ya_ref[...] = ycat[:, H : H + nf]

    # case-5 numerator source: last l_num history samples + pass-A output
    sbuf[:, :l_num] = hist_ref[:, H - l_num : H]
    sbuf[:, l_num:] = ycat[:, H : H + nf]

    # ---- pass B: final output with new coefficients (reuses ycat; stale
    # pass-A values beyond the write cursor are only reachable via zero
    # denominator coefficients)
    for bi in range(nblocks):
        q = H + bi * B
        num_x = fir(cnb_ref, xcat_ref[:, q - l_num : q + B], l_num)
        num_s = fir(cnb_ref, sbuf[:, bi * B : bi * B + B + l_num], l_num)
        sel = sel_ref[:, bi * B : (bi + 1) * B] != 0
        num = jnp.where(sel, num_s, num_x)
        w = _funnel(ycat[:, q - rb : q + B + l_den], offb, W)
        den = fir(cdb_ref, w, l_den)
        base = jnp.where(sel, sbuf[:, l_num + bi * B : l_num + bi * B + B],
                         xcat_ref[:, q : q + B])
        fb = fb_ref[:, bi * B : (bi + 1) * B]
        ycat[:, q : q + B] = base - fb * (num - den)
    yb_ref[...] = ycat[:, H : H + nf]


def ltpf_both_passes_pallas(p, xcat, hist_y, c_num_a, c_den_a, p_int_a,
                            c_num_b, c_den_b, p_int_b, fade_down, fadeB,
                            use_scratch, H: int, rb: int,
                            interpret: bool = False):
    """Returns (yA [S, nf], yB [S, nf]). S must be a multiple of 256."""
    S = xcat.shape[0]
    nf = p.nf
    B = 16 if nf % 16 == 0 else 15
    l_num, l_den = p.l_num, p.l_den
    assert S % SB == 0, "pad the stream axis to a multiple of 256"
    ceil_half = l_den - l_den // 2
    off_a = jnp.clip(rb - p_int_a - ceil_half, 0, rb).astype(jnp.int32)[:, None]
    off_b = jnp.clip(rb - p_int_b - ceil_half, 0, rb).astype(jnp.int32)[:, None]

    row = lambda c: pl.BlockSpec((SB, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shared = pl.BlockSpec((1, nf), lambda i: (0, 0), memory_space=pltpu.VMEM)

    ya, yb = pl.pallas_call(
        partial(_ltpf_kernel, H, nf, B, l_num, l_den, rb),
        out_shape=(jax.ShapeDtypeStruct((S, nf), F32),
                   jax.ShapeDtypeStruct((S, nf), F32)),
        grid=(S // SB,),
        in_specs=[
            row(H + nf),          # xcat
            row(H),               # hist_y
            row(l_num + 1), row(l_den + 1), row(1),   # pass A coefs + off
            row(l_num + 1), row(l_den + 1), row(1),   # pass B coefs + off
            shared,               # fade_down [1, nf]
            row(nf),              # fadeB (per stream)
            row(nf),              # use_scratch int32
        ],
        out_specs=(row(nf), row(nf)),
        scratch_shapes=[
            pltpu.VMEM((SB, H + nf + l_den), F32),
            pltpu.VMEM((SB, l_num + nf), F32),
        ],
        interpret=interpret,
    )(
        xcat, hist_y, c_num_a, c_den_a, off_a, c_num_b, c_den_b, off_b,
        fade_down[None, :], fadeB, use_scratch.astype(jnp.int32),
    )
    return ya, yb
