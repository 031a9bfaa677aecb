"""Reference-parity facade.

Mirrors the reference public API surface (encoder/lc3_encoder.rs:115-209,
decoder/lc3_decoder.rs:180-244): `Lc3Encoder` / `Lc3Decoder` with
`encode_frame` / `decode_frame`, and the `calc_working_buffer_lengths`
const-calculators. The TPU framework manages memory functionally (device
arrays in jitted programs), so the calculators exist for drop-in parity and
capacity planning: they return exactly the reference's required buffer
element counts; `decoder_ram_bytes` reproduces the published 27,564-byte
figure (reference README.md:130).
"""

from __future__ import annotations

from .config import FrameDuration, Lc3Config, SamplingFrequency
from .ref.decoder import Lc3Decoder
from .ref.encoder import Lc3Encoder

__all__ = [
    "Lc3Encoder",
    "Lc3Decoder",
    "FrameDuration",
    "SamplingFrequency",
    "Lc3Config",
    "encoder_calc_working_buffer_lengths",
    "decoder_calc_working_buffer_lengths",
    "decoder_ram_bytes",
]


def _ltpf_dec_lengths(cfg: Lc3Config) -> dict:
    l_den = {8000: 4, 16000: 4, 24000: 6, 32000: 8, 44100: 11, 48000: 12}[cfg.fs]
    l_num = l_den - 2
    if cfg.n_ms == FrameDuration.MS10:
        num_mem, norm = 2, cfg.nf // 4
    else:
        num_mem, norm = 3, cfg.nf // 3
    return dict(
        c_num=l_num + 1,
        c_den=l_den + 1,
        mems=2 * num_mem * cfg.nf,
        scratch=l_num + norm,
    )


def decoder_calc_working_buffer_lengths(
    num_channels: int,
    frame_duration: FrameDuration,
    sampling_frequency: SamplingFrequency | int,
) -> tuple[int, int]:
    """(scaler_len, complex_len) exactly as the reference const fn
    (decoder/lc3_decoder.rs:156-162, 236-244)."""
    cfg = Lc3Config.new(sampling_frequency, frame_duration)
    dct_scaler = cfg.nf // 2 + (cfg.nf - cfg.ne) + (cfg.nf - cfg.z) + 2 * cfg.nf + cfg.nf
    dct_complex = cfg.nf // 2 * 4
    plc = cfg.ne
    lt = _ltpf_dec_lengths(cfg)
    ltpf = lt["c_den"] * 3 + lt["c_num"] * 2 + lt["mems"] + lt["scratch"]
    scaler = cfg.ne + plc + dct_scaler + ltpf
    return num_channels * scaler, num_channels * dct_complex


def decoder_ram_bytes(
    num_channels: int,
    frame_duration: FrameDuration,
    sampling_frequency: SamplingFrequency | int,
) -> int:
    """Working-buffer bytes (f32 scaler + 8-byte Complex)."""
    s, c = decoder_calc_working_buffer_lengths(
        num_channels, frame_duration, sampling_frequency
    )
    return 4 * s + 8 * c


def encoder_calc_working_buffer_lengths(
    num_channels: int,
    frame_duration: FrameDuration,
    sampling_frequency: SamplingFrequency | int,
) -> tuple[int, int, int]:
    """(integer_len, scaler_len, complex_len) as the reference const fn
    (encoder/lc3_encoder.rs:193-209)."""
    cfg = Lc3Config.new(sampling_frequency, frame_duration)
    if cfg.n_ms == FrameDuration.MS10:
        len12, delay = 128, 24
    else:
        len12, delay = 96, 44
    up = {8000: 24, 16000: 12, 24000: 8, 32000: 6, 44100: 4, 48000: 4}[cfg.fs]
    x_s_ext = 240 // up + cfg.nf
    x12_len = len12 + delay + 232
    x64_len = 64 + 114
    integer = 2 * cfg.nf + x_s_ext + cfg.ne
    scaler = x12_len + x64_len + cfg.nf + cfg.nb
    complex_len = cfg.nf // 2 * 4
    return (
        num_channels * integer,
        num_channels * scaler,
        num_channels * complex_len,
    )
