"""Stream-axis sharding over the virtual 8-device CPU mesh."""

import jax
import numpy as np

from lc3jax.coding.host import parse_frames
from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.dsp.decoder import decode_step, decoder_init
from lc3jax.dsp.encoder import encode_step, encoder_init
from lc3jax.parallel import (
    make_sharded_decode_frames,
    make_sharded_decode_step,
    make_sharded_encode_step,
    shard_streams,
    sharded_decoder_init,
    sharded_encoder_init,
    stream_mesh,
)
from lc3jax.ref.encoder import Lc3Encoder

CFG48 = Lc3Config.new(48000, FrameDuration.MS10)
NBYTES = 80


def _mesh():
    devices = jax.devices()
    assert len(devices) >= 8, "conftest sets an 8-device virtual CPU platform"
    return stream_mesh(devices[:8])


def _payloads(nframes=1, S=16):
    t = np.arange(nframes * 480) / 48000
    sig = (6000 * np.sin(2 * np.pi * 330 * t)).astype(np.int16)
    enc = Lc3Encoder(1, FrameDuration.MS10, 48000)
    per_frame = [
        bytes(enc.encode_frame(0, sig[f * 480 : (f + 1) * 480], NBYTES))
        for f in range(nframes)
    ]
    return sig, [[p] * S for p in per_frame]


def test_sharded_decode_matches_single_device(goldens):
    mesh = _mesh()
    S = 16
    _, frames_raw = _payloads(1, S)
    frames = parse_frames(CFG48, frames_raw[0])

    # single device
    st1 = decoder_init(CFG48, S)
    st1, pcm1 = jax.jit(lambda s, f: decode_step(CFG48, NBYTES * 8, s, f))(st1, frames)

    # sharded over the mesh — inputs deliberately NOT pre-placed: the jit's
    # explicit in_shardings must reshard them onto the mesh
    st8 = decoder_init(CFG48, S)
    step = make_sharded_decode_step(CFG48, NBYTES * 8, mesh)
    st8, pcm8 = step(st8, frames)

    assert "streams" in str(pcm8.sharding)
    assert "streams" in str(st8.mem_ola.sharding)
    # the SPMD partitioner may fuse differently than the single-device
    # program; allow the usual 1-LSB rounding envelope
    d = np.abs(np.asarray(pcm1).astype(int) - np.asarray(pcm8).astype(int))
    assert d.max() <= 1
    assert (d > 0).mean() < 0.01


def test_sharded_encode_matches_single_device():
    mesh = _mesh()
    S = 16
    t = np.arange(480) / 48000
    pcm = np.stack([(6000 * np.sin(2 * np.pi * (200 + 17 * s) * t)).astype(np.int16)
                    for s in range(S)])

    st1 = encoder_init(CFG48, S)
    st1, f1 = jax.jit(lambda s, x: encode_step(CFG48, NBYTES, s, x))(st1, pcm)

    st8 = sharded_encoder_init(CFG48, S, mesh)
    step = make_sharded_encode_step(CFG48, NBYTES, mesh)
    st8, f8 = step(st8, shard_streams(mesh, pcm))

    assert "streams" in str(f8["x_q"].sharding)
    # integer coding decisions must agree exactly between the replicated and
    # SPMD programs on all but knife-edge frames; this synthetic input is
    # nowhere near a knife edge, so require exact equality of all int fields
    for k in f1:
        a, b = np.asarray(f1[k]), np.asarray(f8[k])
        if a.dtype.kind in "iub":
            assert np.array_equal(a, b), k


def test_sharded_decode_frames_scan():
    mesh = _mesh()
    T, S = 3, 16
    _, frames_raw = _payloads(T, S)
    parsed = [parse_frames(CFG48, p) for p in frames_raw]
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *parsed)

    st = sharded_decoder_init(CFG48, S, mesh)
    run = make_sharded_decode_frames(CFG48, NBYTES * 8, mesh)
    st, pcm = run(st, shard_streams(mesh, stacked, axis=1))
    assert pcm.shape == (T, S, CFG48.nf)
    assert "streams" in str(pcm.sharding)

    # reference: unsharded stepwise decode
    st1 = decoder_init(CFG48, S)
    step = jax.jit(lambda s, f: decode_step(CFG48, NBYTES * 8, s, f))
    outs = []
    for f in range(T):
        st1, p = step(st1, parsed[f])
        outs.append(np.asarray(p))
    d = np.abs(np.asarray(pcm).astype(int) - np.stack(outs).astype(int))
    assert d.max() <= 1
    assert (d > 0).mean() < 0.01


def test_sharded_encode_frames_scan():
    """[T, S, nf] PCM through the sharded frame-axis encode scan, compared
    against the unsharded scan. The SPMD partitioner may fuse the float
    analysis differently, and a single-ulp difference can flip a TNS
    prediction-gain or quantizer knife edge for a stream (observed even
    between the stepwise and scan programs on one device) — so require
    exact integer agreement on the overwhelming majority of streams and a
    decodable payload for every stream."""
    from lc3jax.coding.host import pack_frames
    from lc3jax.dsp.streaming import encode_frames
    from lc3jax.parallel import make_sharded_encode_frames
    from lc3jax.ref.decoder import Lc3Decoder

    mesh = _mesh()
    T, S = 3, 16
    t = np.arange(T * 480) / 48000
    sigs = np.stack([
        (6000 * np.sin(2 * np.pi * (180 + 23 * s) * t)).astype(np.int16)
        for s in range(S)
    ])  # [S, T*nf]
    pcm_t = np.stack([sigs[:, f * 480 : (f + 1) * 480] for f in range(T)])

    st8 = sharded_encoder_init(CFG48, S, mesh)
    run = make_sharded_encode_frames(CFG48, NBYTES, mesh)
    st8, f8 = run(st8, shard_streams(mesh, pcm_t, axis=1))
    assert f8["x_q"].shape == (T, S, CFG48.ne)
    assert "streams" in str(f8["x_q"].sharding)

    st1 = encoder_init(CFG48, S)
    st1, f1 = jax.jit(lambda s, x: encode_frames(CFG48, NBYTES, s, x))(
        st1, pcm_t
    )
    int_keys = [k for k in f1 if np.asarray(f1[k]).dtype.kind in "iub"]
    exact = np.ones(S, bool)
    for k in int_keys:
        a, b = np.asarray(f1[k]), np.asarray(f8[k])
        if a.ndim >= 2:  # [T, S, ...]
            exact &= (a == b).reshape(T, S, -1).all(axis=(0, 2))
    assert exact.mean() >= 0.8, f"only {int(exact.sum())}/{S} streams exact"

    dec = Lc3Decoder(1, FrameDuration.MS10, 48000)
    for f in range(T):
        fields_f = {k: np.asarray(v)[f] for k, v in f8.items()}
        for payload in pack_frames(CFG48, fields_f, NBYTES):
            dec.decode_frame(16, 0, payload)  # must stay decodable


def test_multihost_helpers_single_process():
    """The multi-host entry points must degrade cleanly to one process:
    multihost_stream_mesh covers all local devices and
    multihost_shard_streams lands data identically to shard_streams."""
    from lc3jax.parallel import multihost_shard_streams, multihost_stream_mesh

    mesh = multihost_stream_mesh()
    assert mesh.devices.size == len(jax.devices())
    x = np.arange(mesh.devices.size * 4, dtype=np.float32).reshape(-1, 4)
    arr = multihost_shard_streams(mesh, x)
    assert "streams" in str(arr.sharding)
    np.testing.assert_array_equal(np.asarray(arr), x)


def test_sharded_fused_bytes_step():
    """The fully fused bytes->PCM program sharded over the mesh (the
    multi-chip serving shape): must match the unsharded fused step."""
    from functools import partial

    from lc3jax.coding.device import decode_bytes_step
    from lc3jax.parallel import make_sharded_decode_bytes_step

    mesh = _mesh()
    S = 16
    _, frames_raw = _payloads(1, S)
    payloads = np.frombuffer(b"".join(frames_raw[0]), np.uint8).reshape(S, NBYTES)

    st1 = decoder_init(CFG48, S)
    st1, pcm1 = jax.jit(partial(decode_bytes_step, CFG48, NBYTES))(st1, payloads)

    st8 = sharded_decoder_init(CFG48, S, mesh)
    step = make_sharded_decode_bytes_step(CFG48, NBYTES, mesh)
    st8, pcm8 = step(st8, shard_streams(mesh, payloads))

    assert "streams" in str(pcm8.sharding)
    d = np.abs(np.asarray(pcm1).astype(int) - np.asarray(pcm8).astype(int))
    assert d.max() <= 1
