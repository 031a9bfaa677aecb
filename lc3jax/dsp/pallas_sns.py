"""Pallas TPU kernel: SNS stage-2 PVQ pyramid + shape/gain selection.

The encoder's SNS stage 2 (spectral_noise_shaping.rs:285-518) is a chain of
greedy unit-pulse additions (6 + 2 + 10 rounds, each a sequential 16-lane
cross-multiplied comparison scan), set manipulations, unit-energy
normalisation and a 14-candidate MSE shape/gain search. Vectorised in XLA
this is ~120 tiny [S, 16] fusions whose dispatch overhead dominated the
stage (~1.0 ms at S=2048). This kernel runs the whole pyramid in VMEM with
streams on wide lane blocks; per-round "take the winning lane" reads are
carried through the comparison scan instead of gathered.

The arithmetic mirrors lc3jax.dsp.encoder.sns_analysis line by line
(sequential f32 folds, strict-> comparisons with first-lane-wins ties, the
reference's scan-artifact accumulator carryover) — asserted bit-exact
against the XLA path in tests/test_pallas_sns.py.

Outputs: y_sel (signed pulses of the winning shape), y0s (shape-0 pulses,
needed for the set-B MPVQ index), xq_sel (normalised shape), shape_j, gind,
g_sel.
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
I32 = jnp.int32
LANES = 128

_GAINS = np.zeros((4, 8), dtype=np.float32)
_GAINS_N = [1, 3, 3, 7]
for _j, _g in enumerate(T.SNS_GAINS_BY_SHAPE):
    _GAINS[_j, : len(_g)] = _g


def _sfold(rows, n: int):
    """Sequential f32 fold over the first n sublane rows of [16, L]."""
    acc = rows[0, :]
    for i in range(1, n):
        acc = acc + rows[i, :]
    return acc


def _kernel(lanes: int, t2_ref, yi_ref, xf_ref):
    x = t2_ref[...]  # [16, L] f32
    absx = jnp.abs(x)
    iota16 = jax.lax.broadcasted_iota(I32, (16, lanes), 0)

    abs_sum = _sfold(absx, 16)
    proj = F32(5.0) / abs_sum
    y3 = jnp.floor(absx * proj[None, :]).astype(I32)
    y3f = y3.astype(F32)
    k0 = _sfold(y3f, 16).astype(I32)
    corr = _sfold(y3f * absx, 16)
    energy = _sfold(y3f * y3f, 16)

    def greedy(y, corr_l, energy_l, corr_art, energy_art, need, n_active):
        yf = y.astype(F32)
        cand_corr = corr_l[None, :] + absx  # [16, L]
        cand_sq = cand_corr * cand_corr
        cand_en = energy_l[None, :] + F32(2.0) * yf + F32(1.0)
        n_best = jnp.zeros((lanes,), I32)
        best_sq = cand_sq[0, :]
        best_en = cand_en[0, :]
        best_abs = absx[0, :]
        best_y = yf[0, :]
        for lane in range(1, n_active):
            better = cand_sq[lane, :] * best_en > best_sq * cand_en[lane, :]
            n_best = jnp.where(better, lane, n_best)
            best_sq = jnp.where(better, cand_sq[lane, :], best_sq)
            best_en = jnp.where(better, cand_en[lane, :], best_en)
            best_abs = jnp.where(better, absx[lane, :], best_abs)
            best_y = jnp.where(better, yf[lane, :], best_y)
        new_corr = jnp.where(need, corr_l + best_abs, corr_l)
        new_energy = jnp.where(need, energy_l + F32(2.0) * best_y + F32(1.0),
                               energy_l)
        corr_art = jnp.where(need, cand_corr[n_active - 1, :], corr_art)
        energy_art = jnp.where(need, cand_en[n_active - 1, :], energy_art)
        y = jnp.where(need[None, :] & (iota16 == n_best[None, :]), y + 1, y)
        return y, new_corr, new_energy, corr_art, energy_art

    # shape 3: K=6 pulses
    corr_l, energy_l = corr, energy
    corr_art, energy_art = corr, energy
    count = k0
    for _ in range(6):
        need = count < 6
        y3, corr_l, energy_l, corr_art, energy_art = greedy(
            y3, corr_l, energy_l, corr_art, energy_art, need, 16
        )
        count = jnp.where(need, count + 1, count)

    # shape 2: +2 pulses seeded from the artifact accumulators
    y2 = y3
    corr_l, energy_l = corr_art, energy_art
    ones = jnp.ones((lanes,), bool)
    for _ in range(2):
        y2, corr_l, energy_l, corr_art, energy_art = greedy(
            y2, corr_l, energy_l, corr_art, energy_art, ones, 16
        )

    # shape 1: strip set B, re-add pulses in set A up to K=10
    setb = iota16 >= 10
    y1 = jnp.where(setb, 0, y2)
    k1 = 8 - _sfold(jnp.where(setb, y2, 0).astype(F32), 16).astype(I32)
    corr_l = corr_art
    energy_l = energy_art
    for lane in range(10, 16):
        v = y2[lane, :].astype(F32)
        nz = v != 0.0
        corr_l = jnp.where(nz, corr_l - v * absx[lane, :], corr_l)
        energy_l = jnp.where(nz, energy_l - v * v, energy_l)
    count = k1
    for _ in range(10):
        need = count < 10
        y1, corr_l, energy_l, corr_art, energy_art = greedy(
            y1, corr_l, energy_l, corr_art, energy_art, need, 10
        )
        count = jnp.where(need, count + 1, count)

    # shape 0: y1 + one pulse at argmax |x| in set B (first-wins ties)
    nb_best = jnp.full((lanes,), 10, I32)
    b_best = absx[10, :]
    for lane in range(11, 16):
        better = absx[lane, :] > b_best
        nb_best = jnp.where(better, lane, nb_best)
        b_best = jnp.where(better, absx[lane, :], b_best)
    y0 = jnp.where(iota16 == nb_best[None, :], 1, y1)

    sign = jnp.where(x < 0.0, -1, 1)
    ys = [y0 * sign, y1 * sign, y2 * sign, y3 * sign]

    def normalize(y, n_active):
        yf = jnp.where(iota16 < n_active, y, 0).astype(F32)
        norm = jnp.sqrt(_sfold(yf * yf, 16))
        return jnp.where(yf != 0.0, yf / norm[None, :], yf)

    xq = [normalize(ys[0], 16), normalize(ys[1], 10),
          normalize(ys[2], 16), normalize(ys[3], 16)]

    # shape/gain MSE search, scan order j*8+g with strict < (first wins)
    best_mse = None
    shape_j = jnp.zeros((lanes,), I32)
    gind = jnp.zeros((lanes,), I32)
    g_sel = jnp.full((lanes,), _GAINS[0, 0], F32)
    for j in range(4):
        for gi in range(_GAINS_N[j]):
            gv = F32(_GAINS[j, gi])
            diff = x - gv * xq[j]
            mse = _sfold(diff * diff, 16)
            if best_mse is None:
                best_mse = mse
                continue
            better = mse < best_mse
            best_mse = jnp.where(better, mse, best_mse)
            shape_j = jnp.where(better, j, shape_j)
            gind = jnp.where(better, gi, gind)
            g_sel = jnp.where(better, gv, g_sel)

    sel2 = shape_j[None, :]
    y_sel = jnp.where(
        sel2 == 0, ys[0], jnp.where(sel2 == 1, ys[1],
                                    jnp.where(sel2 == 2, ys[2], ys[3]))
    )
    xq_sel = jnp.where(
        sel2 == 0, xq[0], jnp.where(sel2 == 1, xq[1],
                                    jnp.where(sel2 == 2, xq[2], xq[3]))
    )

    yi_ref[0:16, :] = y_sel
    yi_ref[16:32, :] = ys[0]
    yi_ref[32, :] = shape_j
    yi_ref[33, :] = gind
    yi_ref[34:40, :] = jnp.zeros((6, lanes), I32)
    xf_ref[0:16, :] = xq_sel
    xf_ref[16, :] = g_sel
    xf_ref[17:24, :] = jnp.zeros((7, lanes), F32)


def sns_pvq_pallas(t2rot, interpret: bool = False):
    """t2rot [S, 16] f32 -> (y_sel [S,16] i32, y0s [S,16] i32,
    xq_sel [S,16] f32, shape_j [S] i32, gind [S] i32, g_sel [S] f32).

    S must be a multiple of 128."""
    S = t2rot.shape[0]
    assert S % LANES == 0, "pad the stream axis to a multiple of 128"
    lanes = LANES
    while lanes < 1024 and S % (lanes * 2) == 0:
        lanes *= 2

    yi, xf = pl.pallas_call(
        partial(_kernel, lanes),
        out_shape=(
            jax.ShapeDtypeStruct((40, S), I32),
            jax.ShapeDtypeStruct((24, S), F32),
        ),
        grid=(S // lanes,),
        in_specs=[
            pl.BlockSpec((16, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((40, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((24, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(t2rot.T)
    return (yi[0:16].T, yi[16:32].T, xf[0:16].T, yi[32], yi[33], xf[16])
