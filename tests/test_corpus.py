"""Content-diverse quality corpus (tests/goldens/corpus.npz).

200 frames per geometry spanning five content classes — speech-shaped
noise, polyphonic tones, transients/clicks, near-silence, full-scale
(clipping) program — where knife-edge quantizer/PVQ ties concentrate
(tools/gen_corpus.py). The reference was validated informally on real
music (/root/reference/README.md:5); this is the repeatable equivalent:

- the batched encoder + host pack must reproduce the oracle payloads
  byte-exactly (CPU: the bit-exact MDCT/exp2f paths make this
  by-construction, as on stream50),
- the fused batched decode must stay inside a pinned per-geometry
  LSB/SNR envelope vs the oracle PCM.

tools/tpu_parity.py --full re-runs the decode rows on the real chip
with its own (looser, fma-contraction) envelope.
"""

from functools import partial

import numpy as np
import pytest

from lc3jax.config import FrameDuration, Lc3Config

GEOMETRIES = [
    "48000_10ms_120",
    "48000_10ms_20",
    "48000_10ms_400",
    "44100_7.5ms_100",
    "16000_10ms_60",
    "8000_10ms_40",
]


def _cfg(key):
    fs, dur, nb = key.split("_")
    return (
        Lc3Config.new(int(fs), FrameDuration.MS7P5 if dur == "7.5ms"
                      else FrameDuration.MS10),
        int(nb),
    )


@pytest.mark.parametrize("key", GEOMETRIES)
def test_corpus_encode_byte_exact(goldens, key):
    import jax
    import jax.numpy as jnp

    from lc3jax.coding.host import pack_frames
    from lc3jax.dsp.encoder import encode_step, encoder_init

    g = goldens("corpus")
    cfg, nb = _cfg(key)
    pcm_in = g[key + "_pcm_in"]
    payloads = g[key + "_payloads"]
    T = pcm_in.shape[0]

    st = encoder_init(cfg, 1)
    enc_all = jax.jit(
        lambda s, x: jax.lax.scan(partial(encode_step, cfg, nb), s, x)
    )
    _, fields = enc_all(st, jnp.asarray(pcm_in[:, None, :]))
    fnp = {k: np.asarray(v) for k, v in fields.items()}
    for f in range(T):
        out = pack_frames(cfg, {k: v[f] for k, v in fnp.items()}, nb)[0]
        assert out == bytes(payloads[f]), f"{key}: frame {f} diverged"


@pytest.mark.parametrize("key", GEOMETRIES)
def test_corpus_decode_envelope(goldens, key):
    import jax
    import jax.numpy as jnp

    from lc3jax.coding.device import decode_bytes_step
    from lc3jax.dsp.decoder import decoder_init

    g = goldens("corpus")
    cfg, nb = _cfg(key)
    payloads = g[key + "_payloads"]
    want = g[key + "_pcm_out"].astype(np.int64)

    st = decoder_init(cfg, 1)
    dec_all = jax.jit(
        lambda s, b: jax.lax.scan(partial(decode_bytes_step, cfg, nb), s, b)
    )
    _, pcm = dec_all(st, jnp.asarray(payloads[:, None, :]))
    err = np.asarray(pcm)[:, 0].astype(np.int64) - want
    # measured (round 5, all 6 geometries): max 1 LSB, SNR ~110-112 dB vs
    # the oracle — ~90 dB below the codec's own distortion on this content
    # (~10-22 dB vs input, tools/gen_corpus.py). stream50 is bit-exact at
    # 48 k; the diverse corpus hits rare +-1 rounding knife edges in the
    # decoder's unpinned float stages (LTPF/OLA), which is the envelope.
    max_lsb = int(np.abs(err).max())
    assert max_lsb <= 1, f"{key}: max LSB {max_lsb}"
    sig = float(np.sum(want.astype(np.float64) ** 2))
    snr = 10.0 * np.log10(
        sig / max(float(np.sum(err.astype(np.float64) ** 2)), 1.0)
    )
    assert snr >= 100.0, f"{key}: SNR {snr:.1f} dB"
