"""Frame-axis streaming: scan whole chunks of frames in one dispatch.

The per-frame codec state is a pytree, so offline/bulk transcoding maps
naturally onto `lax.scan` over the frame axis (SURVEY.md section 2.5): one
XLA dispatch decodes/encodes T frames x S streams, amortising launch
overhead and keeping the TPU busy between host bitstream batches.
"""

from __future__ import annotations

from functools import partial

import jax

from ..config import Lc3Config
from .decoder import DecoderState, ParsedFrames, decode_step
from .encoder import EncoderState, encode_step


def decode_frames(cfg: Lc3Config, nbits: int, state: DecoderState,
                  frames: ParsedFrames):
    """frames: ParsedFrames with leading frame axis [T, S, ...].
    Returns (state, pcm int16 [T, S, nf])."""

    def step(st, fr):
        return decode_step(cfg, nbits, st, fr)

    return jax.lax.scan(step, state, frames)


def encode_frames(cfg: Lc3Config, nbytes: int, state: EncoderState, pcm):
    """pcm: int16 [T, S, nf]. Returns (state, fields with leading [T] axis)."""

    def step(st, x):
        return encode_step(cfg, nbytes, st, x)

    return jax.lax.scan(step, state, pcm)


def decode_bytes_frames(cfg: Lc3Config, nbytes: int, state: DecoderState,
                        payloads):
    """Fully fused bulk decode: raw frame bytes [T, S, nbytes] -> PCM
    [T, S, nf] in one dispatch (Pallas range decoder on TPU backends)."""
    from ..coding.device import decode_bytes_step

    def step(st, b):
        return decode_bytes_step(cfg, nbytes, st, b)

    return jax.lax.scan(step, state, payloads)


def encode_bytes_frames(cfg: Lc3Config, nbytes: int, state: EncoderState, pcm):
    """Fully fused bulk encode: PCM [T, S, nf] -> frame bytes
    [T, S, nbytes] in one dispatch (Pallas range encoder; TPU only)."""
    from ..coding.pallas_pack import encode_bytes_step

    def step(st, x):
        return encode_bytes_step(cfg, nbytes, st, x)

    return jax.lax.scan(step, state, pcm)


def make_decode_frames(cfg: Lc3Config, nbits: int):
    return jax.jit(partial(decode_frames, cfg, nbits), donate_argnums=(0,))


def make_encode_frames(cfg: Lc3Config, nbytes: int):
    return jax.jit(partial(encode_frames, cfg, nbytes), donate_argnums=(0,))


def make_decode_bytes_frames(cfg: Lc3Config, nbytes: int):
    return jax.jit(partial(decode_bytes_frames, cfg, nbytes), donate_argnums=(0,))


def make_encode_bytes_frames(cfg: Lc3Config, nbytes: int):
    return jax.jit(partial(encode_bytes_frames, cfg, nbytes), donate_argnums=(0,))
