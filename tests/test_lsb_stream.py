"""lsb_mode through the full chain: TPU encode -> native pack -> native
parse -> TPU decode (VERDICT round-1 gap 3).

High-rate 48 kHz (150 B => nbits 1200 >= 480+4*160) with dense noisy
content drives nbits_est past nbits_spec on most frames, so the encoder's
LSB side-channel (bitstream_encoding.rs:295-311) and the decoder's
save_lev replay (arithmetic_codec.rs:194-204) are both exercised
end-to-end, asserted frame-by-frame against the oracle path.
"""

from functools import partial

import jax
import numpy as np
import pytest

from lc3jax.coding import native
from lc3jax.coding.host import parse_frames
from lc3jax.config import FrameDuration, Lc3Config

CFG = Lc3Config.new(48000, FrameDuration.MS10)
NBYTES = 150
NFRAMES = 20


def _lsb_heavy_stream(seed=2):
    # full-scale clipped noise keeps the quantized spectrum dense enough
    # that the bit estimate overshoots even after the gain adjustment ->
    # lsb_mode on every frame (same recipe as test_device_bitstream)
    rng = np.random.default_rng(seed)
    sig = 28000 * rng.standard_normal(NFRAMES * CFG.nf)
    return np.clip(sig, -32768, 32767).astype(np.int16)


@pytest.mark.skipif(not native.available(), reason="native library not built")
def test_lsb_mode_end_to_end():
    from lc3jax.dsp.decoder import decode_step, decoder_init
    from lc3jax.dsp.encoder import encode_step, encoder_init
    from lc3jax.ref.decoder import Lc3Decoder
    from lc3jax.ref.encoder import Lc3Encoder

    sig = _lsb_heavy_stream()
    enc = Lc3Encoder(1, CFG.n_ms, CFG.fs)
    dec_oracle = Lc3Decoder(1, CFG.n_ms, CFG.fs)

    est = encoder_init(CFG, 1)
    estep = jax.jit(partial(encode_step, CFG, NBYTES))
    dst = decoder_init(CFG, 1)
    dstep = jax.jit(lambda s, fr: decode_step(CFG, NBYTES * 8, s, fr))

    n_lsb = 0
    n_exact = 0
    for f in range(NFRAMES):
        frame = sig[f * CFG.nf : (f + 1) * CFG.nf]
        want_payload = bytes(enc.encode_frame(0, frame, NBYTES))

        est, fields = estep(est, frame[None])
        n_lsb += bool(np.asarray(fields["quant_lsb_mode"])[0])
        fields_h = {k: np.asarray(v) for k, v in fields.items()}
        payload = bytes(native.pack_frames_native(CFG, fields_h, NBYTES)[0])
        n_exact += payload == want_payload

        # native parse must round-trip the lsb fields bit-exactly vs the
        # python parser, and the TPU decode of the produced payload must
        # track the oracle decode of the same payload within +-1 LSB
        pf_native = native.parse_frames_native(
            CFG, np.frombuffer(payload, np.uint8)[None]
        )
        pf_python = parse_frames(CFG, [payload])
        assert bool(np.asarray(pf_python.lsb_mode)[0]) == bool(
            np.asarray(pf_native.lsb_mode)[0]
        )
        np.testing.assert_array_equal(
            np.asarray(pf_native.x_int), np.asarray(pf_python.x_int)
        )
        want_pcm = dec_oracle.decode_frame(16, 0, payload)
        dst, pcm = dstep(dst, pf_native)
        d = np.abs(np.asarray(pcm)[0].astype(int) - want_pcm.astype(int))
        assert d.max() <= 1, f"frame {f}: {d.max()} LSB"

    # the content must actually force the lsb path, and the TPU encoder
    # must stay overwhelmingly byte-exact on it
    assert n_lsb >= 0.5 * NFRAMES, f"only {n_lsb}/{NFRAMES} frames in lsb_mode"
    assert n_exact >= 0.7 * NFRAMES, f"{n_exact}/{NFRAMES} byte-exact"
