"""Gather-free window extraction primitives for TPU.

Per-element gathers (take_along_axis with per-stream indices) lower to
serialized loads on TPU (~20 ns/element measured on v5e) and dominated
both codec directions before these replacements. Two patterns cover every
hot case in LC3, because all dynamic indices are contiguous windows at a
per-stream (and usually frame-constant) offset:

- funnel_rows: w[s, j] = slab[s, off_s + j] via log2-stage static-slice
  pairs + lane-parallel selects (a funnel/barrel shifter).
- shifted_stack: vals[s, b, k] = win[s, l + b - k] via static slices,
  for stream-invariant sliding windows (FIR tap stacks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def funnel_rows(slab, off, width: int):
    """w[s, j] = slab[s, off_s + j] for j in [0, width) — no gathers.

    Each stage is a static slice pair plus a per-stream select, all
    lane-parallel on the VPU. Caller guarantees 0 <= off <= sw - width
    (clip if unsure; out-of-range hi reads see zeros).
    """
    sw = slab.shape[1]
    nbits = max(1, (sw - width).bit_length())
    cur = slab
    for b in reversed(range(nbits)):
        step = 1 << b
        need = min(cur.shape[1], (step - 1) + width)
        lo = jax.lax.slice_in_dim(cur, 0, need, axis=1)
        if step + need <= cur.shape[1]:
            hi = jax.lax.slice_in_dim(cur, step, step + need, axis=1)
        else:
            tail = jax.lax.slice_in_dim(cur, step, cur.shape[1], axis=1)
            hi = jnp.pad(tail, ((0, 0), (0, step + need - cur.shape[1])))
        bit = ((off >> b) & 1).astype(bool)[:, None]
        cur = jnp.where(bit, hi, lo)
        off = off - jnp.where(bit[:, 0], step, 0)
    return cur


def shifted_stack(win, l: int, B: int):
    """[S, B+l] window -> [S, B, l+1] with vals[s, b, k] = win[s, l + b - k].

    Static slices only; replaces stream-invariant sliding-window gathers.
    """
    return jnp.stack(
        [jax.lax.slice_in_dim(win, l - k, l - k + B, axis=1) for k in range(l + 1)],
        axis=2,
    )
