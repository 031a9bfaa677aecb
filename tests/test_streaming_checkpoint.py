"""Frame-axis scan streaming, checkpoint/resume, metrics."""

from functools import partial

import jax
import numpy as np

from lc3jax.checkpoint import load_state, save_state
from lc3jax.coding.host import parse_frames
from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.dsp.decoder import decode_step, decoder_init
from lc3jax.dsp.streaming import decode_frames, encode_frames
from lc3jax.dsp.encoder import encoder_init
from lc3jax.metrics import CodecMetrics
from lc3jax.ref.encoder import Lc3Encoder

CFG48 = Lc3Config.new(48000, FrameDuration.MS10)


def _payload_batch(nframes, S, nbytes=80):
    t = np.arange(nframes * 480) / 48000
    sig = (6000 * np.sin(2 * np.pi * 330 * t)).astype(np.int16)
    encs = [Lc3Encoder(1, FrameDuration.MS10, 48000) for _ in range(S)]
    return [
        [bytes(encs[s].encode_frame(0, sig[f * 480 : (f + 1) * 480], nbytes))
         for s in range(S)]
        for f in range(nframes)
    ]


def test_decode_frames_scan_matches_stepwise():
    T, S, nbytes = 4, 2, 80
    per_frame = _payload_batch(T, S, nbytes)
    parsed = [parse_frames(CFG48, p) for p in per_frame]
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *parsed)

    st_scan = decoder_init(CFG48, S)
    scan_fn = jax.jit(partial(decode_frames, CFG48, nbytes * 8))
    st_scan, pcm_scan = scan_fn(st_scan, stacked)

    st_step = decoder_init(CFG48, S)
    step = jax.jit(lambda s, f: decode_step(CFG48, nbytes * 8, s, f))
    outs = []
    for f in range(T):
        st_step, pcm = step(st_step, parsed[f])
        outs.append(np.asarray(pcm))
    assert np.array_equal(np.asarray(pcm_scan), np.stack(outs))


def test_encode_frames_scan_runs():
    T, S = 3, 2
    t = np.arange(T * 480) / 48000
    sig = (6000 * np.sin(2 * np.pi * 330 * t)).astype(np.int16)
    pcm = np.stack([np.stack([sig[f * 480 : (f + 1) * 480]] * S) for f in range(T)])
    st = encoder_init(CFG48, S)
    fn = jax.jit(partial(encode_frames, CFG48, 80))
    st, fields = fn(st, pcm)
    assert np.asarray(fields["x_q"]).shape == (T, S, CFG48.ne)


def test_checkpoint_resume_bitexact(tmp_path):
    S, nbytes = 2, 80
    per_frame = _payload_batch(6, S, nbytes)
    step = jax.jit(lambda s, f: decode_step(CFG48, nbytes * 8, s, f))

    st = decoder_init(CFG48, S)
    for f in range(3):
        st, _ = step(st, parse_frames(CFG48, per_frame[f]))
    path = str(tmp_path / "state.npz")
    save_state(path, st)

    # continue from live state
    st_live = st
    outs_live = []
    for f in range(3, 6):
        st_live, pcm = step(st_live, parse_frames(CFG48, per_frame[f]))
        outs_live.append(np.asarray(pcm))

    # continue from restored checkpoint
    st_rest = load_state(path, decoder_init(CFG48, S))
    outs_rest = []
    for f in range(3, 6):
        st_rest, pcm = step(st_rest, parse_frames(CFG48, per_frame[f]))
        outs_rest.append(np.asarray(pcm))

    assert np.array_equal(np.stack(outs_live), np.stack(outs_rest))


def test_checkpoint_validation_rejects_mismatches(tmp_path):
    import pytest

    S = 2
    st = decoder_init(CFG48, S)
    path = str(tmp_path / "state.npz")
    save_state(path, st, config_tag="48000/MS10/S=2")

    # wrong batch size -> shape mismatch
    with pytest.raises(ValueError, match="shape"):
        load_state(path, decoder_init(CFG48, 4))
    # wrong config tag
    with pytest.raises(ValueError, match="config mismatch"):
        load_state(path, decoder_init(CFG48, S), config_tag="48000/MS10/S=4")
    # matching tag loads fine
    load_state(path, decoder_init(CFG48, S), config_tag="48000/MS10/S=2")
    # structural drift: a tree with different field names must fail loudly
    like = {"mem_ola": np.zeros((S, 480 - 180), np.float32)}
    with pytest.raises(ValueError, match="field mismatch"):
        load_state(path, like)
    # legacy/foreign npz without metadata is rejected
    np.savez(str(tmp_path / "old.npz"), leaf_0=np.zeros(3))
    with pytest.raises(ValueError, match="missing metadata"):
        load_state(str(tmp_path / "old.npz"), decoder_init(CFG48, S))


def test_metrics():
    m = CodecMetrics()
    m.record_decode(100, 0.01, n_bad=2)
    m.record_encode(50, 0.01)
    snap = m.snapshot()
    assert snap["frames_decoded"] == 100
    assert snap["plc_frames"] == 2
    assert abs(snap["audio_seconds"] - 1.5) < 1e-9
    assert m.plc_rate == 0.02


def test_decode_bytes_frames_scan_matches_stepwise():
    """The fused bytes->PCM frame scan (XLA parser on CPU; Pallas kernel on
    TPU) must equal the per-frame fused step."""
    from functools import partial as _partial

    from lc3jax.coding.device import decode_bytes_step
    from lc3jax.dsp.streaming import decode_bytes_frames

    T, S, nbytes = 3, 2, 80
    per_frame = _payload_batch(T, S, nbytes)
    stacked = np.stack([
        np.frombuffer(b"".join(p), np.uint8).reshape(S, nbytes)
        for p in per_frame
    ])

    st_scan = decoder_init(CFG48, S)
    scan_fn = jax.jit(_partial(decode_bytes_frames, CFG48, nbytes))
    st_scan, pcm_scan = scan_fn(st_scan, stacked)

    st_step = decoder_init(CFG48, S)
    step = jax.jit(_partial(decode_bytes_step, CFG48, nbytes))
    outs = []
    for f in range(T):
        st_step, pcm = step(st_step, stacked[f])
        outs.append(np.asarray(pcm))
    assert np.array_equal(np.asarray(pcm_scan), np.stack(outs))
