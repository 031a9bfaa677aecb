#!/usr/bin/env python3
"""Generate the content-diverse quality corpus (tests/goldens/corpus.npz).

Every other golden in this repo is a single synthetic content class
(sines, FM sweeps, Gaussian noise, click trains). The reference was
validated informally on real music (/root/reference/README.md:5,
examples/compare.rs); this corpus is the repeatable stand-in: per
geometry, a 200-frame stream of five 40-frame content classes where
knife-edge quantizer/PVQ ties concentrate —

  1. speech-shaped noise  — 1/f-tilted noise, 4 Hz syllabic AM, pauses
  2. polyphonic tones     — detuned 3-note chord with overtones + vibrato
  3. transients           — near-silence with clicks and drum-like bursts
  4. near-silence         — dither-level noise (amplitude ~30 LSB)
  5. full-scale           — saturating swept program material

Geometries cover the envelope matrix used by tools/tpu_parity.py --full
(8/16/44.1/48 kHz, both frame durations, the 20 B minimum and 400 B
maximum rate edges) plus the flagship 48 k/10 ms/120 B.

Each stream is encoded and decoded with the bit-exact oracle
(lc3jax/ref/*); tests/test_corpus.py asserts the batched TPU-path
formulations reproduce the payloads byte-exactly and the PCM within the
pinned LSB/SNR envelope on CPU, and tools/tpu_parity.py re-runs the
decode rows on the real chip.
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.ref.decoder import Lc3Decoder
from lc3jax.ref.encoder import Lc3Encoder

GEOMETRIES = [
    (48000, FrameDuration.MS10, 120),
    (48000, FrameDuration.MS10, 20),
    (48000, FrameDuration.MS10, 400),
    (44100, FrameDuration.MS7P5, 100),
    (16000, FrameDuration.MS10, 60),
    (8000, FrameDuration.MS10, 40),
]
FRAMES_PER_CLASS = 40
N_CLASSES = 5


def _speech_shaped(rng, n, fs):
    # white noise through a one-pole lowpass (~ -6 dB/oct tilt), syllabic
    # 4 Hz amplitude modulation, and two hard pauses
    w = rng.standard_normal(n)
    x = np.empty(n)
    acc = 0.0
    a = 0.82
    for i in range(n):
        acc = a * acc + (1 - a) * w[i]
        x[i] = acc
    t = np.arange(n) / fs
    am = 0.25 + 0.75 * np.clip(np.sin(2 * np.pi * 3.7 * t) + 0.4, 0, 1)
    x *= am
    for p0 in (0.35, 0.72):
        i0 = int(p0 * n)
        x[i0 : i0 + int(0.04 * fs)] *= 0.01
    return 52000.0 * x / max(np.abs(x).max(), 1e-9) * 0.35


def _polyphonic(rng, n, fs):
    t = np.arange(n) / fs
    vib = 1.0 + 0.004 * np.sin(2 * np.pi * 5.3 * t)
    x = np.zeros(n)
    nyq = fs / 2
    for f0, amp in ((220.0, 1.0), (277.18, 0.8), (329.63, 0.9)):
        for h in range(1, 9):
            fh = f0 * h * (vib if h == 1 else 1.0)
            if np.max(fh) >= nyq * 0.95:
                break
            x += (amp / h) * np.sin(2 * np.pi * fh * t + rng.uniform(0, 6.28))
    env = np.minimum(1.0, t * 8.0) * (0.55 + 0.45 * np.cos(2 * np.pi * 0.7 * t) ** 2)
    return 17000.0 * x / np.abs(x).max() * env


def _transients(rng, n, fs):
    x = 25.0 * rng.standard_normal(n)
    period = max(int(0.09 * fs), 8)
    for i0 in range(period // 2, n - 64, period):
        x[i0] += rng.choice([-1, 1]) * 30000.0  # single-sample click
    # two drum-like bursts: exponentially decaying noise
    for p0 in (0.3, 0.75):
        i0 = int(p0 * n)
        ln = min(int(0.05 * fs), n - i0)
        x[i0 : i0 + ln] += (
            24000.0
            * rng.standard_normal(ln)
            * np.exp(-np.arange(ln) / (0.008 * fs))
        )
    return x


def _near_silence(rng, n, fs):
    t = np.arange(n) / fs
    return 18.0 * rng.standard_normal(n) + 12.0 * np.sin(2 * np.pi * 313.0 * t)


def _full_scale(rng, n, fs):
    t = np.arange(n) / fs
    f_hi = min(6000.0, fs * 0.35)
    sweep = np.sin(
        2 * np.pi * (80.0 * t + 0.5 * (f_hi - 80.0) / max(t[-1], 1e-9) * t**2)
    )
    x = 36000.0 * sweep + 4000.0 * rng.standard_normal(n)  # deliberately clips
    return x


CLASSES = [_speech_shaped, _polyphonic, _transients, _near_silence, _full_scale]


def build_stream(cfg: Lc3Config, rng) -> np.ndarray:
    n_seg = FRAMES_PER_CLASS * cfg.nf
    segs = [fn(rng, n_seg, cfg.fs) for fn in CLASSES]
    pcm = np.concatenate(segs)
    return np.clip(pcm, -32768, 32767).astype(np.int16)


def main() -> None:
    out = {}
    for fs, dur, nb in GEOMETRIES:
        cfg = Lc3Config.new(fs, dur)
        rng = np.random.default_rng(20260820 + fs + nb)
        pcm = build_stream(cfg, rng)
        T = N_CLASSES * FRAMES_PER_CLASS
        enc = Lc3Encoder(1, dur, fs)
        dec = Lc3Decoder(1, dur, fs)
        payloads, decoded = [], []
        for f in range(T):
            frame = pcm[f * cfg.nf : (f + 1) * cfg.nf]
            payload = bytes(enc.encode_frame(0, frame, nb))
            payloads.append(payload)
            decoded.append(dec.decode_frame(16, 0, payload))
        key = f"{fs}_{dur.value}_{nb}"
        out[key + "_pcm_in"] = pcm.reshape(T, cfg.nf)
        out[key + "_payloads"] = np.frombuffer(
            b"".join(payloads), np.uint8
        ).reshape(T, nb)
        out[key + "_pcm_out"] = np.stack(decoded)
        # codec distortion of the oracle itself, for scale: device/batched
        # deviation envelopes must sit far below this. The codec has an
        # algorithmic delay (MDCT look-ahead), so align by searching the
        # delay that maximizes SNR before comparing.
        got = out[key + "_pcm_out"].reshape(-1).astype(np.float64)
        ref = pcm.reshape(-1).astype(np.float64)
        skip = 2 * cfg.nf  # decoder warm-up
        best = -1e9
        for d in range(cfg.nf + 1):
            r = ref[skip : len(ref) - d]
            g_ = got[skip + d :]
            e = float(np.sum((r - g_) ** 2))
            s = 10.0 * np.log10(float(np.sum(r**2)) / max(e, 1.0))
            if s > best:
                best, bd = s, d
        print(f"{key}: oracle codec SNR vs input = {best:.1f} dB "
              f"(delay {bd} samples)")
    np.savez_compressed("tests/goldens/corpus.npz", **out)
    tot = sum(v.nbytes for v in out.values())
    print(f"wrote tests/goldens/corpus.npz ({len(GEOMETRIES)} geometries, "
          f"{tot/1e6:.1f} MB uncompressed)")


if __name__ == "__main__":
    main()
