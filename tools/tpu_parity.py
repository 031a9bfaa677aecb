#!/usr/bin/env python3
"""Pin TPU-backend numerics: run the stream50 regression on the real chip.

The CPU test suite validates the batched path against the oracle, but
nothing repeatable validated the numbers the *TPU* produces (fma
contraction, bf16 one-hot matmuls, Pallas kernels). This tool runs the
pinned 50-frame stream (tests/goldens/stream50.npz) through:

- the fully fused on-device decode (Pallas range decoder + DSP), and
- the on-device encoder (+ native pack),

on whatever jax.devices() provides, and writes TPU_PARITY.json with the
max-LSB decode error vs the oracle PCM and the encoder byte-exact rate.

Measured on v5e: the decode error accumulates through the LTPF/OLA state
feedback (fma contraction) to a bounded plateau of 11 LSB (~-64 dBFS, far
below the codec's own quantization noise) — repeating the stream 4x stays
at 11. The encoder is byte-exact on all 50 frames on-device. Asserted
envelope: decode <= 12 LSB (measured plateau 11 + 1 margin), encoder
byte-exact rate >= 0.95 (measured 1.0) with every payload decodable, and
the fuzz bad-rate inside a sanity band (random bytes must mostly trip the
side-info/range checks; a collapse to ~0 or ~1 means a parser regression).

Usage: python tools/tpu_parity.py [out.json] [--full]

--full additionally smoke-checks the parse and pack kernels across the
geometry/rate envelope (16 k/10 ms/60 B, 44.1 k/7.5 ms/100 B,
8 k/10 ms/40 B, 48 k at the 20 B minimum and 400 B maximum — the last
drives lsb_mode on every frame): clean-frame field parity and byte-exact
payloads vs the host implementations. Each config compiles two extra
programs (~minutes cold).

--full also runs the fused DECODE (kernels + DSP, not just parse/pack) at
every envelope geometry over the 200-frame content-diverse corpus
(tests/goldens/corpus.npz: speech-shaped noise, polyphonic tones,
transients, near-silence, full-scale — tools/gen_corpus.py), recording
per-geometry max-LSB and SNR (dB) vs the oracle PCM with asserted floors.
This turns the single-geometry "11-LSB plateau, far below quantization
noise" claim into a measured matrix: the device-vs-oracle SNR (>=55 dB
floor) sits ~40 dB above the codec's own distortion on the same content
(~10-22 dB vs input). Envelope per geometry in _DECODE_ENVELOPE.
"""

from __future__ import annotations

import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Per-geometry device-decode envelope over the content-diverse corpus.
# The fma/OLA error plateau is RELATIVE to signal level (first --full run:
# SNR 61.6-64.9 dB on every geometry while absolute max-LSB ranged 57-91 —
# the corpus's full-scale class simply scales the same ~ -62 dB plateau up;
# stream50's 11 LSB was moderate-level content, not a tighter device).
# So the asserted floors are content-scaled: stream SNR vs the oracle PCM
# (measured 61.6+, floor 55) and peak-relative error
# 20*log10(max_abs_err / max_abs_signal) (measured -51.1 dB or better,
# envelope -48). max_lsb is recorded, with only a loose catastrophic
# backstop asserted (the reference's integer-PCM golden discipline,
# lc3_decoder.rs:372-425, maps here to SNR/relative floors because the
# MXU's f32 matmul semantics make bit-exactness a cost, not a default —
# see BENCH_SWEEP.md "exact-on-device" close-out).
_DECODE_ENVELOPE = {
    "48000_10ms_120": {"max_lsb": 160, "min_snr_db": 55.0, "max_rel_db": -48.0},
    "48000_10ms_20": {"max_lsb": 160, "min_snr_db": 55.0, "max_rel_db": -48.0},
    "48000_10ms_400": {"max_lsb": 160, "min_snr_db": 55.0, "max_rel_db": -48.0},
    "44100_7.5ms_100": {"max_lsb": 160, "min_snr_db": 55.0, "max_rel_db": -48.0},
    "16000_10ms_60": {"max_lsb": 160, "min_snr_db": 55.0, "max_rel_db": -48.0},
    "8000_10ms_40": {"max_lsb": 160, "min_snr_db": 55.0, "max_rel_db": -48.0},
}


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/lc3jax-xla-cache-tpu")
    import jax.numpy as jnp
    import numpy as np

    from lc3jax.coding import native
    from lc3jax.coding.device import decode_bytes_step
    from lc3jax.config import FrameDuration, Lc3Config
    from lc3jax.dsp.decoder import decoder_init
    from lc3jax.dsp.encoder import encode_step, encoder_init
    from lc3jax.ref.decoder import Lc3Decoder

    cfg = Lc3Config.new(48000, FrameDuration.MS10)
    g = np.load(os.path.join(os.path.dirname(__file__), "..", "tests",
                             "goldens", "stream50.npz"))
    nbytes = int(g["nbytes"])
    payloads = g["payloads"]  # [T, nbytes]
    pcm_in = g["pcm_in"].astype(np.int16)
    pcm_out = g["pcm_out"].astype(np.int16)
    T = payloads.shape[0]
    S = 128  # replicate the stream across the kernel's minimum lane count

    # ---- fused on-device decode: bytes -> PCM as one lax.scan over the
    # frame axis (per-frame D2H fetches over the axon tunnel are unusable;
    # one dispatch + one fetch)
    state = decoder_init(cfg, S)
    bytes_t = jnp.asarray(np.tile(payloads[:, None, :], (1, S, 1)))  # [T,S,nb]

    @jax.jit
    def decode_all(st, bt):
        return jax.lax.scan(partial(decode_bytes_step, cfg, nbytes), st, bt)

    _, pcm_all = decode_all(state, bytes_t)
    got = np.asarray(pcm_all)  # [T, S, nf]
    assert np.all(got == got[:, :1]), "lanes diverged on-device"
    err0 = got[:, 0].astype(np.int64) - pcm_out.astype(np.int64)
    max_lsb = int(np.abs(err0).max())
    snr0 = 10.0 * np.log10(
        float(np.sum(pcm_out.astype(np.float64) ** 2))
        / max(float(np.sum(err0.astype(np.float64) ** 2)), 1.0)
    )

    # ---- on-device encode (scan) + native pack, decodability + exact rate
    estate = encoder_init(cfg, S)
    pcm_t = jnp.asarray(np.tile(pcm_in[:, None, :], (1, S, 1)))

    @jax.jit
    def encode_all(st, xt):
        return jax.lax.scan(partial(encode_step, cfg, nbytes), st, xt)

    _, fields_all = encode_all(estate, pcm_t)
    fields_np = {k: np.asarray(v) for k, v in fields_all.items()}
    dec = Lc3Decoder(1, cfg.n_ms, cfg.fs)
    n_exact = 0
    for f in range(T):
        fields_h = {k: v[f] for k, v in fields_np.items()}
        rows = native.pack_frames_native(cfg, fields_h, nbytes)
        out = bytes(rows[0])
        n_exact += out == bytes(g["payloads"][f])
        dec.decode_frame(16, 0, out)  # must stay decodable

    # ---- fully fused on-device encode (Pallas range encoder): frame bytes
    # must be byte-identical to the native pack of the same fields
    from lc3jax.coding.pallas_pack import encode_bytes_step

    e2state = encoder_init(cfg, S)

    @jax.jit
    def encode_bytes_all(st, xt):
        return jax.lax.scan(partial(encode_bytes_step, cfg, nbytes), st, xt)

    _, payloads_dev = encode_bytes_all(e2state, pcm_t)
    pdev = np.asarray(payloads_dev)  # [T, S, nbytes]
    n_pack_exact = 0
    for f in range(T):
        fields_h = {k: v[f] for k, v in fields_np.items()}
        want = bytes(native.pack_frames_native(cfg, fields_h, nbytes)[0])
        n_pack_exact += bytes(pdev[f, 0]) == want

    # ---- on-device parser differential fuzz: random bytes + valid frames
    # vs the native host parser (bad flags identical, clean fields identical)
    import dataclasses

    from lc3jax.coding.device import device_parse

    rng = np.random.default_rng(99)
    fuzz = rng.integers(0, 256, (2048, nbytes), dtype=np.uint8)
    fuzz[: T] = payloads  # mix in the valid pinned frames
    host_pf = native.parse_frames_native(cfg, fuzz)
    dev_pf = jax.jit(partial(device_parse, cfg, nbytes))(jnp.asarray(fuzz))
    badm = np.asarray(host_pf.bad_frame)
    fuzz_ok = np.array_equal(badm, np.asarray(dev_pf.bad_frame))
    for fld in dataclasses.fields(host_pf):
        if fld.name == "bad_frame":
            continue
        a = np.asarray(getattr(host_pf, fld.name))
        b = np.asarray(getattr(dev_pf, fld.name))
        fuzz_ok = fuzz_ok and np.array_equal(a[~badm], b[~badm])

    # ---- per-stage attribution of the decode LSB plateau: tap the DSP at
    # the spectral output (post SNS/PLC) and post-IMDCT/pre-LTPF, on-chip
    # and in the oracle, to locate where the fma-contraction drift enters
    from lc3jax.dsp.decoder import decode_step

    host_pf = native.parse_frames_native(cfg, payloads)  # leading axis T
    pf_t = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.repeat(np.asarray(a)[:, None], S, axis=1)),
        host_pf,
    )
    st2 = decoder_init(cfg, S)

    @jax.jit
    def decode_taps(st, fr):
        return jax.lax.scan(
            partial(decode_step, cfg, nbytes * 8, debug_taps=True), st, fr
        )

    _, (pcm2, taps) = decode_taps(st2, pf_t)
    xs_dev = np.asarray(taps["x_spec"])[:, 0]  # [T, ne]
    tp_dev = np.asarray(taps["t_pre_ltpf"])[:, 0]  # [T, nf]
    dec_o = Lc3Decoder(1, cfg.n_ms, cfg.fs)
    dec_o.channels[0].debug_taps = True
    xs_err = tp_err = 0.0
    for f in range(T):
        dec_o.decode_frame(16, 0, bytes(payloads[f]))
        o = dec_o.channels[0].taps
        xs_err = max(xs_err, float(np.abs(xs_dev[f] - o["x_spec"]).max()))
        tp_err = max(tp_err, float(np.abs(tp_dev[f] - o["t_pre_ltpf"]).max()))
    final_lsb2 = int(
        np.abs(np.asarray(pcm2)[:, 0].astype(int) - pcm_out.astype(int)).max()
    )
    ltpf_adds = final_lsb2 - tp_err
    stage_attr = {
        "spectral_max_abs_err": round(xs_err, 6),
        "pre_ltpf_max_abs_err_pcm_units": round(tp_err, 4),
        "final_max_lsb": final_lsb2,
        "note": (
            f"the plateau forms BEFORE the LTPF: pre-LTPF error "
            f"{tp_err:.1f} PCM units vs final {final_lsb2} LSB (LTPF "
            f"contributes ~{max(ltpf_adds, 0.0):.1f}). Source: fma "
            "contraction in the spectral chain and IMDCT matmul, "
            "recirculated through the OLA overlap memory across frames. "
            "The 12-LSB envelope = the measured 11-LSB OLA-feedback "
            "plateau plus 1; LTPF history is NOT an amplifier here."
        ),
    }

    result = {
        "device": str(jax.devices()[0]),
        "frames": T,
        "decode_max_lsb_vs_oracle": max_lsb,
        "decode_snr_db_vs_oracle": round(snr0, 1),
        "stage_attribution": stage_attr,
        "encode_byte_exact_rate": round(n_exact / T, 3),
        "device_pack_byte_exact_rate": round(n_pack_exact / T, 3),
        "device_parse_fuzz_2048": bool(fuzz_ok),
        "device_parse_fuzz_bad_rate": round(float(badm.mean()), 3),
        "envelope": {"decode_max_lsb": 12, "encode_byte_exact_min": 0.95,
                     "device_pack_byte_exact": 1.0,
                     "fuzz_bad_rate_band": [0.5, 0.999]},
        "pass": bool(max_lsb <= 12 and n_exact / T >= 0.95
                     and n_pack_exact == T and fuzz_ok
                     and 0.5 <= float(badm.mean()) <= 0.999),
    }
    if "--full" in sys.argv:
        from lc3jax.coding.host import pack_frames as _pack_host
        from lc3jax.coding.pallas_pack import device_pack
        from lc3jax.coding.pallas_parse import device_parse_pallas
        from lc3jax.ref.encoder import Lc3Encoder

        configs = [
            (16000, FrameDuration.MS10, 60),
            (44100, FrameDuration.MS7P5, 100),
            (8000, FrameDuration.MS10, 40),
            (48000, FrameDuration.MS10, 20),
            (48000, FrameDuration.MS10, 400),
        ]
        result["full"] = {}
        for fs_, dur_, nb_ in configs:
            c = Lc3Config.new(fs_, dur_)
            Sf = 256
            enc2 = Lc3Encoder(1, c.n_ms, c.fs)
            rng2 = np.random.default_rng(5)
            tt = np.arange(c.nf) / c.fs
            rows = [
                np.frombuffer(bytes(enc2.encode_frame(0, np.clip(
                    20000 * rng2.standard_normal(c.nf) if i % 2
                    else 8000 * np.sin(2 * np.pi * (90 + 29 * i) * tt),
                    -32768, 32767).astype(np.int16), nb_)), np.uint8)
                for i in range(63)
            ]
            rows += [rng2.integers(0, 256, nb_, dtype=np.uint8)]
            batch = np.stack(rows * 4)
            hostf = native.parse_frames_native(c, batch)
            devf = jax.jit(partial(device_parse_pallas, c, nb_))(
                jnp.asarray(batch)
            )
            bm = np.asarray(hostf.bad_frame)
            pok = np.array_equal(bm, np.asarray(devf.bad_frame)) and all(
                np.array_equal(np.asarray(getattr(hostf, f2.name))[~bm],
                               np.asarray(getattr(devf, f2.name))[~bm])
                for f2 in dataclasses.fields(hostf)
                if f2.name != "bad_frame"
            )
            est2 = encoder_init(c, Sf)
            pcm2 = jnp.asarray(np.stack(
                [np.clip(22000 * rng2.standard_normal(c.nf), -32768, 32767)
                 .astype(np.int16)] * Sf))
            _, flds = jax.jit(
                partial(encode_step, c, nb_, emit_pack=True)
            )(est2, pcm2)
            want2 = _pack_host(c, {k: np.asarray(v) for k, v in flds.items()
                                   if k != "quant_pack_tables"}, nb_)
            got2 = np.asarray(jax.jit(partial(device_pack, c, nb_))(flds))
            kok = all(bytes(got2[s2]) == want2[s2] for s2 in range(Sf))
            key = f"{fs_}_{dur_.value}_{nb_}B"
            result["full"][key] = {"parse": bool(pok), "pack": bool(kok)}
            result["pass"] = bool(result["pass"] and pok and kok)

            # the production serving batch (S=2048) runs the kernels at
            # their max lane width (parse 2048, pack 1024) — widths the
            # S=256 checks above never reach (round 4 dropped the analytic
            # VMEM caps; the widest grid is the config that actually
            # ships). Pin byte-exactness at max lane width on the binding
            # worst-case geometry.
            if (fs_, nb_) == (48000, 400):
                batch8 = np.tile(batch, (8, 1))
                hostf8 = native.parse_frames_native(c, batch8)
                devf8 = jax.jit(partial(device_parse_pallas, c, nb_))(
                    jnp.asarray(batch8)
                )
                bm8 = np.asarray(hostf8.bad_frame)
                pok8 = (np.array_equal(bm8, np.asarray(devf8.bad_frame))
                        and all(
                            np.array_equal(
                                np.asarray(getattr(hostf8, f2.name))[~bm8],
                                np.asarray(getattr(devf8, f2.name))[~bm8])
                            for f2 in dataclasses.fields(hostf8)
                            if f2.name != "bad_frame"))
                # stream axis: quant_pack_tables is [rows, S] (stream-minor);
                # every other non-scalar field is stream-major [S, ...]
                flds8 = {k: (jnp.tile(v, (1, 8)) if k == "quant_pack_tables"
                             else jnp.tile(v, (8,) + (1,) * (v.ndim - 1))
                             if v.ndim else v) for k, v in flds.items()}
                got8 = np.asarray(jax.jit(partial(device_pack, c, nb_))(flds8))
                kok8 = all(bytes(got8[s2]) == want2[s2 % Sf]
                           for s2 in range(8 * Sf))
                result["full"][key + "_S2048_maxlanes"] = {
                    "parse": bool(pok8), "pack": bool(kok8)}
                result["pass"] = bool(result["pass"] and pok8 and kok8)

    if "--full" in sys.argv:
        # ---- fused DECODE fidelity matrix over the content-diverse corpus:
        # per-geometry max-LSB + SNR vs the oracle PCM (VERDICT r4 item 1 —
        # the reference pins integer PCM per config, lc3_decoder.rs:372-425)
        corpus = np.load(os.path.join(os.path.dirname(__file__), "..",
                                      "tests", "goldens", "corpus.npz"))
        keys = sorted({k[: k.rfind("_pcm_in")] for k in corpus.files
                       if k.endswith("_pcm_in")})
        result["decode_matrix"] = {}
        for key in keys:
            fs_ = int(key.split("_")[0])
            dur_ = (FrameDuration.MS7P5 if key.split("_")[1] == "7.5ms"
                    else FrameDuration.MS10)
            nb_ = int(key.split("_")[2])
            c = Lc3Config.new(fs_, dur_)
            pay = corpus[key + "_payloads"]
            want = corpus[key + "_pcm_out"].astype(np.int64)
            Td = pay.shape[0]
            dstate = decoder_init(c, S)
            bt = jnp.asarray(np.tile(pay[:, None, :], (1, S, 1)))

            dec_all = jax.jit(lambda st, b, c=c, nb_=nb_: jax.lax.scan(
                partial(decode_bytes_step, c, nb_), st, b))
            _, pcm_c = dec_all(dstate, bt)
            gotc = np.asarray(pcm_c)
            assert np.all(gotc == gotc[:, :1]), f"{key}: lanes diverged"
            errc = gotc[:, 0].astype(np.int64) - want
            lsb_c = int(np.abs(errc).max())
            sig_c = float(np.sum(want.astype(np.float64) ** 2))
            snr_c = 10.0 * np.log10(
                sig_c / max(float(np.sum(errc.astype(np.float64) ** 2)), 1.0))
            peak = max(float(np.abs(want).max()), 1.0)
            rel_db = 20.0 * np.log10(max(lsb_c, 1) / peak)
            env = _DECODE_ENVELOPE[key]
            row_ok = (lsb_c <= env["max_lsb"] and snr_c >= env["min_snr_db"]
                      and rel_db <= env["max_rel_db"])
            result["decode_matrix"][key] = {
                "frames": Td, "max_lsb": lsb_c,
                "snr_db_vs_oracle": round(snr_c, 1),
                "peak_rel_err_db": round(rel_db, 1),
                "envelope": env, "pass": bool(row_ok),
            }
            result["pass"] = bool(result["pass"] and row_ok)

    out_path = next((a for a in sys.argv[1:] if not a.startswith("--")),
                    "TPU_PARITY.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    if not result["pass"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
