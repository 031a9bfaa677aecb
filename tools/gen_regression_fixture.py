#!/usr/bin/env python3
"""Generate the long-stream regression fixture (tests/goldens/stream50.npz).

50 frames of mixed synthetic audio encoded and decoded with the bit-exact
oracle; future optimization rounds must keep byte-identical encoder output
and bit-identical decoder PCM on this pinned stream (same role as the
reference's golden end-to-end tests, SURVEY.md section 4).
"""

import numpy as np

from lc3jax.config import FrameDuration
from lc3jax.ref.decoder import Lc3Decoder
from lc3jax.ref.encoder import Lc3Encoder


def main() -> None:
    nframes, nbytes = 50, 120
    rng = np.random.default_rng(20260816)
    t = np.arange(nframes * 480) / 48000
    sweep = np.sin(2 * np.pi * (200 + 30 * np.sin(2 * np.pi * 0.8 * t)) * t)
    sig = (
        7000 * sweep
        + 1500 * np.sin(2 * np.pi * 2333 * t)
        + 300 * rng.standard_normal(len(t))
    )
    envelope = np.minimum(1.0, t * 4.0) * (0.4 + 0.6 * np.cos(2 * np.pi * 0.5 * t) ** 2)
    pcm = (sig * envelope).astype(np.int16)

    enc = Lc3Encoder(1, FrameDuration.MS10, 48000)
    dec = Lc3Decoder(1, FrameDuration.MS10, 48000)
    payloads = []
    decoded = []
    for f in range(nframes):
        frame = pcm[f * 480 : (f + 1) * 480]
        payload = bytes(enc.encode_frame(0, frame, nbytes))
        payloads.append(payload)
        decoded.append(dec.decode_frame(16, 0, payload))

    np.savez_compressed(
        "tests/goldens/stream50.npz",
        pcm_in=pcm.reshape(nframes, 480),
        payloads=np.frombuffer(b"".join(payloads), np.uint8).reshape(nframes, nbytes),
        pcm_out=np.stack(decoded),
        nbytes=nbytes,
    )
    print(f"wrote stream50.npz: {nframes} frames @ {nbytes} B")


if __name__ == "__main__":
    main()
