"""Stream-axis sharding over the virtual 8-device CPU mesh."""

import numpy as np
import jax

from lc3jax.coding.host import parse_frames
from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.dsp.decoder import decode_step, decoder_init
from lc3jax.parallel import make_sharded_decode_step, shard_streams, stream_mesh
from lc3jax.ref.encoder import Lc3Encoder

CFG48 = Lc3Config.new(48000, FrameDuration.MS10)


def test_sharded_decode_matches_single_device(goldens):
    devices = jax.devices()
    assert len(devices) >= 8, "conftest sets an 8-device virtual CPU platform"
    mesh = stream_mesh(devices[:8])

    nbytes = 80
    t = np.arange(480) / 48000
    enc = Lc3Encoder(1, FrameDuration.MS10, 48000)
    payload = bytes(enc.encode_frame(0, (6000 * np.sin(2 * np.pi * 330 * t)).astype(np.int16), nbytes))
    S = 16
    frames = parse_frames(CFG48, [payload] * S)

    # single device
    st1 = decoder_init(CFG48, S)
    st1, pcm1 = jax.jit(lambda s, f: decode_step(CFG48, nbytes * 8, s, f))(st1, frames)

    # sharded over the mesh
    st8 = shard_streams(mesh, decoder_init(CFG48, S))
    frames8 = shard_streams(mesh, frames)
    step = make_sharded_decode_step(CFG48, nbytes * 8, mesh)
    st8, pcm8 = step(st8, frames8)

    assert "streams" in str(pcm8.sharding)
    # the SPMD partitioner may fuse differently than the single-device
    # program; allow the usual 1-LSB rounding envelope
    d = np.abs(np.asarray(pcm1).astype(int) - np.asarray(pcm8).astype(int))
    assert d.max() <= 1
    assert (d > 0).mean() < 0.01
