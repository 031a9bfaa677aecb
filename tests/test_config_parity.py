"""Numerical parity for the non-48k geometries (BASELINE config 3).

test_api_runner covers shape-level roundtrips for all 12 configs; these
tests pin the *numbers*: for 16 k / 24 k / 44.1 kHz at both durations the
batched TPU decoder must track the oracle within +-1 LSB over a stateful
15-frame stream, and the TPU encoder must stay overwhelmingly byte-exact
with every payload decodable. Plus a stereo end-to-end CLI roundtrip at
44.1 kHz / 7.5 ms (per-channel state independence, lc3_encoder.rs:42-60).
"""

from functools import partial

import jax
import numpy as np
import pytest

from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.dsp import libmexact

# byte-exact 1.0 floors need glibc's exp2f (see test_dsp_encoder.py);
# non-glibc hosts fall back to the pre-round-3 statistical floors
GLIBC_EXACT = libmexact.available()

CASES = [
    (8000, FrameDuration.MS10, 40),
    (8000, FrameDuration.MS7P5, 30),  # the only 60-band geometry (config.rs:69-72)
    (16000, FrameDuration.MS10, 60),
    (16000, FrameDuration.MS7P5, 50),
    (24000, FrameDuration.MS10, 80),
    (24000, FrameDuration.MS7P5, 60),
    (32000, FrameDuration.MS10, 100),  # attack detector active (nbytes > 80)
    (32000, FrameDuration.MS7P5, 80),  # attack detector active (61 <= n < 150)
    (44100, FrameDuration.MS10, 120),
    (44100, FrameDuration.MS7P5, 100),
]


def _stream(cfg, nframes, seed=5):
    rng = np.random.default_rng(seed)
    t = np.arange(nframes * cfg.nf) / cfg.fs
    sig = (
        5000 * np.sin(2 * np.pi * 330 * t)
        + 2000 * np.sin(2 * np.pi * 1234 * t + 0.3)
        + rng.normal(0, 700, t.shape)
    )
    return np.clip(sig, -32768, 32767).astype(np.int16)


@pytest.mark.parametrize("fs,dur,nbytes", CASES,
                         ids=lambda v: str(getattr(v, "value", v)))
def test_decoder_parity(fs, dur, nbytes):
    from lc3jax.coding.host import parse_frames
    from lc3jax.dsp.decoder import decode_step, decoder_init
    from lc3jax.ref.decoder import Lc3Decoder
    from lc3jax.ref.encoder import Lc3Encoder

    cfg = Lc3Config.new(fs, dur)
    nframes = 15
    sig = _stream(cfg, nframes)
    enc = Lc3Encoder(1, cfg.n_ms, cfg.fs)
    dec = Lc3Decoder(1, cfg.n_ms, cfg.fs)
    state = decoder_init(cfg, 1)
    step = jax.jit(lambda s, fr: decode_step(cfg, nbytes * 8, s, fr))
    for f in range(nframes):
        payload = bytes(enc.encode_frame(0, sig[f * cfg.nf : (f + 1) * cfg.nf], nbytes))
        want = dec.decode_frame(16, 0, payload)
        state, pcm = step(state, parse_frames(cfg, [payload]))
        d = np.abs(np.asarray(pcm)[0].astype(int) - want.astype(int))
        assert d.max() <= 1, f"frame {f}: max {d.max()} LSB"


@pytest.mark.parametrize("fs,dur,nbytes", CASES,
                         ids=lambda v: str(getattr(v, "value", v)))
def test_encoder_parity(fs, dur, nbytes):
    from lc3jax.coding.host import pack_frames
    from lc3jax.dsp.encoder import encode_step, encoder_init
    from lc3jax.ref.decoder import Lc3Decoder
    from lc3jax.ref.encoder import Lc3Encoder

    cfg = Lc3Config.new(fs, dur)
    nframes = 15
    sig = _stream(cfg, nframes, seed=9)
    enc = Lc3Encoder(1, cfg.n_ms, cfg.fs)
    dec = Lc3Decoder(1, cfg.n_ms, cfg.fs)
    state = encoder_init(cfg, 1)
    step = jax.jit(partial(encode_step, cfg, nbytes))
    n_exact = 0
    for f in range(nframes):
        frame = sig[f * cfg.nf : (f + 1) * cfg.nf]
        want = bytes(enc.encode_frame(0, frame, nbytes))
        state, fields = step(state, frame[None])
        got = pack_frames(cfg, {k: np.asarray(v) for k, v in fields.items()}, nbytes)[0]
        n_exact += got == want
        dec.decode_frame(16, 0, got)  # divergent frames must stay decodable
    # byte-exact at every case since the round-3 exactness work (batched
    # kissfft DCT-IV + glibc-exact exp2f + divide-once band energies +
    # 8k/7.5ms SNS narrow-band quirk fix)
    floor = nframes if GLIBC_EXACT else 0.9 * nframes
    assert n_exact >= floor, f"{n_exact}/{nframes} byte-exact"


@pytest.mark.parametrize("dur,nbytes", [(FrameDuration.MS10, 100),
                                        (FrameDuration.MS7P5, 80)],
                         ids=lambda v: str(getattr(v, "value", v)))
def test_encoder_parity_32k_attack(dur, nbytes):
    """32 kHz with transient content loud enough to trip the attack
    detector (attack_detector.rs:91-105): the attack-smoothing SNS branch
    must stay byte-compatible with the oracle."""
    from lc3jax.coding.host import pack_frames
    from lc3jax.dsp import encoder as E
    from lc3jax.dsp.encoder import encode_step, encoder_init
    from lc3jax.ref.decoder import Lc3Decoder
    from lc3jax.ref.encoder import Lc3Encoder

    cfg = Lc3Config.new(32000, dur)
    nframes = 12
    rng = np.random.default_rng(21)
    sig = rng.normal(0, 150, nframes * cfg.nf)
    # click train: silence -> full-scale bursts, the attack detector's
    # canonical trigger
    for k in range(2, nframes, 3):
        pos = k * cfg.nf + cfg.nf // 3
        sig[pos : pos + 40] = 30000.0
    sig = np.clip(sig, -32768, 32767).astype(np.int16)

    # confirm the content actually trips the batched attack detector
    import dataclasses

    p = E.encoder_params(cfg)
    st = encoder_init(cfg, 1)
    fired = 0
    for f in range(nframes):
        frame = sig[f * cfg.nf : (f + 1) * cfg.nf]
        attack, att_state = E.attack_detect(p, st, frame[None], nbytes)
        st = dataclasses.replace(st, **att_state)
        fired += int(np.asarray(attack)[0])
    assert fired >= 1, "click train failed to trip the attack detector"

    enc = Lc3Encoder(1, cfg.n_ms, cfg.fs)
    dec = Lc3Decoder(1, cfg.n_ms, cfg.fs)
    state = encoder_init(cfg, 1)
    step = jax.jit(partial(encode_step, cfg, nbytes))
    n_exact = 0
    for f in range(nframes):
        frame = sig[f * cfg.nf : (f + 1) * cfg.nf]
        want = bytes(enc.encode_frame(0, frame, nbytes))
        state, fields = step(state, frame[None])
        got = pack_frames(cfg, {k: np.asarray(v) for k, v in fields.items()},
                          nbytes)[0]
        n_exact += got == want
        dec.decode_frame(16, 0, got)
    # byte-exact since round 4: the last attack-path divergence was the
    # scale-factor mean (jnp.mean reduces in an unspecified order; the
    # reference folds sequentially — sns_analysis now uses _seq_fold,
    # measured 12/12 at both durations)
    floor = nframes if GLIBC_EXACT else 0.6 * nframes
    assert n_exact >= floor, f"{n_exact}/{nframes} byte-exact"


def test_stereo_cli_roundtrip_44k_7p5(tmp_path):
    from lc3jax.runner import cli
    from lc3jax.runner.wav import read_wav, write_wav

    cfg = Lc3Config.new(44100, FrameDuration.MS7P5)
    nframes = 8
    t = np.arange(nframes * cfg.nf) / cfg.fs
    left = (6000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    right = (4000 * np.sin(2 * np.pi * 660 * t + 1.0)).astype(np.int16)
    pcm = np.stack([left, right], axis=1)
    wav_in = str(tmp_path / "in.wav")
    lc3 = str(tmp_path / "a.lc3")
    lc3_oracle = str(tmp_path / "b.lc3")
    wav_out = str(tmp_path / "out.wav")
    write_wav(wav_in, pcm, 44100)

    args = ["--rate", "44100", "--duration", "7.5", "--nbytes", "100"]
    assert cli.main(["encode", wav_in, lc3, "--nbytes", "100",
                     "--duration", "7.5"]) == 0
    assert cli.main(["encode", wav_in, lc3_oracle, "--nbytes", "100",
                     "--duration", "7.5", "--oracle"]) == 0
    assert cli.main(["decode", lc3, wav_out, "--channels", "2"] + args) == 0
    out, rate = read_wav(wav_out)
    assert rate == 44100 and out.shape == (nframes * cfg.nf, 2)
    # channels must carry independent content (no state crosstalk): the
    # codec delay shifts the waveform, so check each channel's dominant
    # frequency instead of sample-aligned correlation
    tail = out[cfg.nf :]  # skip the algorithmic-delay warmup
    freqs = np.fft.rfftfreq(tail.shape[0], 1.0 / 44100)
    fl = freqs[np.argmax(np.abs(np.fft.rfft(tail[:, 0].astype(np.float64))))]
    fr = freqs[np.argmax(np.abs(np.fft.rfft(tail[:, 1].astype(np.float64))))]
    assert abs(fl - 440.0) < 10.0, fl
    assert abs(fr - 660.0) < 10.0, fr
    assert tail[:, 0].std() > 1000 and tail[:, 1].std() > 700
