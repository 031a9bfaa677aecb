"""API facade parity + CLI round trip + full config-matrix compile."""

from functools import partial

import jax
import numpy as np
import pytest

from lc3jax.api import (
    decoder_calc_working_buffer_lengths,
    decoder_ram_bytes,
    encoder_calc_working_buffer_lengths,
)
from lc3jax.config import ALL_CONFIGS, FrameDuration, Lc3Config


def test_decoder_buffer_lengths_match_reference():
    # reference README.md:130 publishes 27,564 bytes decoder working RAM
    assert decoder_ram_bytes(1, FrameDuration.MS10, 48000) == 27564
    s, c = decoder_calc_working_buffer_lengths(1, FrameDuration.MS10, 48000)
    assert c == 960  # nf/2*4 (dct_iv.rs:69-71)
    s2, c2 = decoder_calc_working_buffer_lengths(2, FrameDuration.MS10, 48000)
    assert (s2, c2) == (2 * s, 2 * c)


def test_encoder_buffer_lengths():
    i, s, c = encoder_calc_working_buffer_lengths(1, FrameDuration.MS10, 48000)
    # integer: 2*nf (mdct) + 60+nf (x_s_extended) + ne
    assert i == 960 + 540 + 400
    assert c == 960


def test_wav_roundtrip(tmp_path):
    from lc3jax.runner.wav import read_wav, write_wav

    rng = np.random.default_rng(0)
    pcm = (1000 * rng.standard_normal((480, 2))).astype(np.int16)
    path = str(tmp_path / "t.wav")
    write_wav(path, pcm, 48000)
    back, rate = read_wav(path)
    assert rate == 48000
    assert np.array_equal(back, pcm)


def test_cli_encode_decode_roundtrip(tmp_path):
    from lc3jax.runner import cli
    from lc3jax.runner.wav import read_wav, write_wav

    t = np.arange(10 * 480) / 48000
    sig = (6000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    wav_in = str(tmp_path / "in.wav")
    lc3 = str(tmp_path / "a.lc3")
    lc3_oracle = str(tmp_path / "b.lc3")
    wav_out = str(tmp_path / "out.wav")
    write_wav(wav_in, sig[:, None], 48000)

    assert cli.main(["encode", wav_in, lc3, "--nbytes", "80"]) == 0
    assert cli.main(["encode", wav_in, lc3_oracle, "--nbytes", "80", "--oracle"]) == 0
    assert cli.main(["compare", lc3, lc3_oracle]) == 0  # byte-identical
    assert cli.main(
        ["decode", lc3, wav_out, "--rate", "48000", "--channels", "1", "--nbytes", "80"]
    ) == 0
    out, rate = read_wav(wav_out)
    assert rate == 48000 and out.shape == (10 * 480, 1)
    assert out.std() > 0.5 * sig.std()


@pytest.mark.parametrize(
    "cfg", ALL_CONFIGS, ids=lambda c: f"{c.fs}_{c.n_ms.value}"
)
def test_all_configs_compile_and_roundtrip(cfg):
    """Every (fs, duration) pair: batched encode -> pack -> parse -> decode."""
    from lc3jax.coding.host import pack_frames, parse_frames
    from lc3jax.dsp.decoder import decode_step, decoder_init
    from lc3jax.dsp.encoder import encode_step, encoder_init

    nbytes = max(20, int(cfg.fs * 0.0025 * (0.01 if cfg.n_ms == FrameDuration.MS10 else 0.0075) * 100))
    nbytes = min(nbytes, 400)
    t = np.arange(3 * cfg.nf) / cfg.fs
    sig = (6000 * np.sin(2 * np.pi * 330 * t)).astype(np.int16)

    est = encoder_init(cfg, 1)
    dst = decoder_init(cfg, 1)
    estep = jax.jit(partial(encode_step, cfg, nbytes))
    dstep = jax.jit(lambda s, f: decode_step(cfg, nbytes * 8, s, f))
    for f in range(3):
        frame = sig[f * cfg.nf : (f + 1) * cfg.nf][None]
        est, fields = estep(est, frame)
        payloads = pack_frames(cfg, {k: np.asarray(v) for k, v in fields.items()}, nbytes)
        dst, pcm = dstep(dst, parse_frames(cfg, payloads))
        assert np.asarray(pcm).shape == (1, cfg.nf)
