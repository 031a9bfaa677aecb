"""File-to-file CLI: encode / decode / compare.

Mirrors the reference's examples (examples/encode.rs, decode.rs,
compare.rs): raw back-to-back `.lc3` frame streams (frame size out-of-band),
channels deinterleaved per frame. The codec path is the batched TPU pipeline
(channels ride the stream axis); use --oracle for the bit-exact host path.

Usage:
  python -m lc3jax.runner.cli encode in.wav out.lc3 --nbytes 150
  python -m lc3jax.runner.cli decode in.lc3 out.wav --rate 48000 --channels 1 --nbytes 150
  python -m lc3jax.runner.cli compare a.lc3 b.lc3
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..config import FrameDuration, Lc3Config
from .wav import read_wav, write_wav


def _duration(arg: str) -> FrameDuration:
    return FrameDuration.MS7P5 if arg in ("7.5", "7.5ms") else FrameDuration.MS10


def cmd_encode(args) -> int:
    samples, rate = read_wav(args.input)
    n, channels = samples.shape
    cfg = Lc3Config.new(rate, _duration(args.duration))
    nf = cfg.nf
    nframes = n // nf
    print(f"encoding {nframes} frames x {channels} ch @ {rate} Hz -> {args.nbytes} B/frame")

    if args.oracle:
        from ..ref.encoder import Lc3Encoder

        enc = Lc3Encoder(channels, cfg.n_ms, cfg.fs)
        with open(args.output, "wb") as f:
            for i in range(nframes):
                for ch in range(channels):
                    f.write(enc.encode_frame(ch, samples[i * nf : (i + 1) * nf, ch],
                                             args.nbytes))
        return 0

    import jax

    from ..coding import native
    from ..coding.host import pack_frames
    from ..dsp.encoder import encoder_init, make_encode_step

    state = encoder_init(cfg, channels)
    step = make_encode_step(cfg, args.nbytes)
    with open(args.output, "wb") as f:
        for i in range(nframes):
            batch = samples[i * nf : (i + 1) * nf].T.copy()  # [ch, nf]
            state, fields = step(state, batch)
            fields = {k: np.asarray(v) for k, v in fields.items()}
            if native.available():
                rows = native.pack_frames_native(cfg, fields, args.nbytes)
                payloads = [bytes(r) for r in rows]
            else:
                payloads = pack_frames(cfg, fields, args.nbytes)
            for p in payloads:
                f.write(p)
    return 0


def cmd_decode(args) -> int:
    with open(args.input, "rb") as f:
        data = f.read()
    cfg = Lc3Config.new(args.rate, _duration(args.duration))
    nf = cfg.nf
    channels = args.channels
    frame_bytes = args.nbytes
    nframes = len(data) // (frame_bytes * channels)
    print(f"decoding {nframes} frames x {channels} ch @ {args.rate} Hz")

    if args.oracle:
        from ..ref.decoder import Lc3Decoder

        dec = Lc3Decoder(channels, cfg.n_ms, cfg.fs)
        out = np.zeros((nframes * nf, channels), np.int16)
        pos = 0
        for i in range(nframes):
            for ch in range(channels):
                payload = data[pos : pos + frame_bytes]
                pos += frame_bytes
                out[i * nf : (i + 1) * nf, ch] = dec.decode_frame(16, ch, payload)
        write_wav(args.output, out, cfg.fs)
        return 0

    import jax

    from ..coding import native
    from ..coding.host import parse_frames
    from ..dsp.decoder import decoder_init, make_decode_step

    state = decoder_init(cfg, channels)
    step = make_decode_step(cfg, frame_bytes * 8)
    out = np.zeros((nframes * nf, channels), np.int16)
    pos = 0
    for i in range(nframes):
        payloads = []
        for ch in range(channels):
            payloads.append(data[pos : pos + frame_bytes])
            pos += frame_bytes
        if native.available():
            arr = np.frombuffer(b"".join(payloads), np.uint8).reshape(channels, frame_bytes)
            frames = native.parse_frames_native(cfg, arr)
        else:
            frames = parse_frames(cfg, payloads)
        state, pcm = step(state, frames)
        out[i * nf : (i + 1) * nf] = np.asarray(pcm).T
    write_wav(args.output, out, cfg.fs)
    return 0


def cmd_inspect(args) -> int:
    """Dump parsed side info per frame (the reference's read_sideinfo.rs
    example analog)."""
    from ..ref.arithmetic import ArithmeticDecodeError
    from ..ref.bitstream import BitstreamError, BufferReader
    from ..ref.side_info import SideInfoError, read_side_info

    cfg = Lc3Config.new(args.rate, _duration(args.duration))
    with open(args.input, "rb") as f:
        data = f.read()
    nframes = len(data) // args.nbytes
    for i in range(min(nframes, args.limit)):
        buf = data[i * args.nbytes : (i + 1) * args.nbytes]
        try:
            si = read_side_info(buf, BufferReader(), cfg.fs_ind, cfg.ne)
            print(
                f"frame {i}: bw={si.bandwidth} lastnz={si.lastnz} "
                f"lsb={int(si.lsb_mode)} gg={si.global_gain_index} "
                f"tns={si.num_tns_filters}x{si.reflect_coef_order_ari_input} "
                f"sns(shape={(si.sns_vq.submode_msb << 1) + si.sns_vq.submode_lsb},"
                f"lf={si.sns_vq.ind_lf},hf={si.sns_vq.ind_hf}) "
                f"ltpf(present={int(si.ltpf.pitch_present)},"
                f"active={int(si.ltpf.is_active)},idx={si.ltpf.pitch_index}) "
                f"nf={si.noise_factor}"
            )
        except (SideInfoError, ArithmeticDecodeError, BitstreamError) as e:
            print(f"frame {i}: CORRUPT ({e})")
    return 0


def cmd_compare(args) -> int:
    """Byte-diff two .lc3 streams (examples/compare.rs)."""
    a = open(args.a, "rb").read()
    b = open(args.b, "rb").read()
    if len(a) != len(b):
        print(f"length mismatch: {len(a)} vs {len(b)}")
    n = min(len(a), len(b))
    diffs = [i for i in range(n) if a[i] != b[i]]
    if not diffs:
        print(f"identical ({n} bytes)")
        return 0
    print(f"{len(diffs)} differing bytes; first at {diffs[0]}")
    return 1


def _set_platform(name: str) -> None:
    if name:
        import jax

        jax.config.update("jax_platforms", name)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="lc3jax", description=__doc__)
    ap.add_argument("--platform", default="", help="jax platform override (e.g. cpu)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("encode")
    pe.add_argument("input")
    pe.add_argument("output")
    pe.add_argument("--nbytes", type=int, default=150)
    pe.add_argument("--duration", default="10")
    pe.add_argument("--oracle", action="store_true")
    pe.set_defaults(fn=cmd_encode)

    pd = sub.add_parser("decode")
    pd.add_argument("input")
    pd.add_argument("output")
    pd.add_argument("--rate", type=int, default=48000)
    pd.add_argument("--channels", type=int, default=1)
    pd.add_argument("--nbytes", type=int, default=150)
    pd.add_argument("--duration", default="10")
    pd.add_argument("--oracle", action="store_true")
    pd.set_defaults(fn=cmd_decode)

    pc = sub.add_parser("compare")
    pc.add_argument("a")
    pc.add_argument("b")
    pc.set_defaults(fn=cmd_compare)

    pi = sub.add_parser("inspect")
    pi.add_argument("input")
    pi.add_argument("--rate", type=int, default=48000)
    pi.add_argument("--nbytes", type=int, default=150)
    pi.add_argument("--duration", default="10")
    pi.add_argument("--limit", type=int, default=20)
    pi.set_defaults(fn=cmd_inspect)

    args = ap.parse_args(argv)
    _set_platform(args.platform)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
