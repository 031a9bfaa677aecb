#!/usr/bin/env python3
"""Interleaved A/B harness for native PACK variants (no jax).

The pack twin of tools/host_parse_ab.py: loads two builds of
liblc3bitstream.so in ONE process and alternates timed pack batches
A,B,A,B,... so host-level noise (cpufreq, neighbor VMs, cache state)
hits both variants equally. This container's run-to-run wall clock
varies +/-30%, so separate-process timing cannot resolve <2x
differences.

Encoder fields come from the bit-exact oracle (lc3jax/ref) with the
bitstream call intercepted — no jax, no device: the same four bench
content classes are encoded once, the captured per-frame field structs
are tiled to n_streams, and both variants' output payloads are checked
byte-identical to the oracle's own frames before timing.

Usage: python tools/host_pack_ab.py A.so B.so [n_streams] [rounds]
"""

from __future__ import annotations

import ctypes
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_lib(path: str):
    from lc3jax import tables as T

    lib = ctypes.CDLL(path)
    c16 = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    c32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    cu8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.lc3_load_tables.argtypes = [c16, c16, cu8, c16, c16, c16, c16, c32]
    lib.lc3_pack_frames.restype = ctypes.c_int
    lib.lc3_pack_frames.argtypes = (
        [ctypes.c_int] * 4
        + [c32, ctypes.c_int]                      # bandwidth, nbits_bw
        + [c32] * 7                                # sns fields
        + [c32, ctypes.c_int, c32, c32]            # num_tns, lpcw, rc_order, rc_i
        + [cu8, cu8, c32]                          # ltpf
        + [c32, c32, ctypes.c_int, c32, cu8, c32]  # spec side
        + [c32, cu8, c32, cu8]                     # x_q, res_bits, n_res, out
    )
    lib.lc3_load_tables(
        np.ascontiguousarray(T.AC_SPEC_FREQ, np.int16),
        np.ascontiguousarray(T.AC_SPEC_CUMFREQ, np.int16),
        np.ascontiguousarray(T.AC_SPEC_LOOKUP, np.uint8),
        np.ascontiguousarray(T.AC_TNS_ORDER_FREQ, np.int16),
        np.ascontiguousarray(T.AC_TNS_ORDER_CUMFREQ, np.int16),
        np.ascontiguousarray(T.AC_TNS_COEF_FREQ, np.int16),
        np.ascontiguousarray(T.AC_TNS_COEF_CUMFREQ, np.int16),
        np.ascontiguousarray(T.MPVQ_OFFSETS, np.int32),
    )
    return lib


def oracle_fields(cfg, nbytes: int, contents) -> tuple[dict, list[bytes]]:
    """Encode each content frame with the oracle, capturing the exact
    field structs its bitstream stage consumes (and its payload)."""
    from lc3jax.ref.encoder import Lc3Encoder

    enc = Lc3Encoder(len(contents), cfg.n_ms, cfg.fs)
    captured: list[dict] = []
    payloads: list[bytes] = []
    for ch, pcm in enumerate(contents):
        bs = enc.channels[ch].bitstream
        real_encode = bs.encode

        def spy(bw, nbits_bw, sns, tns, ltpf, spec, residual, noise, x_q,
                nb, _real=real_encode, _cap=captured):
            _cap.append(dict(bw=bw, nbits_bw=nbits_bw, sns=sns, tns=tns,
                             ltpf=ltpf, spec=spec, residual=residual,
                             noise=noise, x_q=np.array(x_q, np.int32)))
            return _real(bw, nbits_bw, sns, tns, ltpf, spec, residual,
                         noise, x_q, nb)

        bs.encode = spy
        payloads.append(bytes(enc.encode_frame(ch, pcm, nbytes)))
        bs.encode = real_encode

    ne = cfg.ne
    n = len(captured)
    f = {
        "bandwidth": np.zeros(n, np.int32),
        "sns_ind_lf": np.zeros(n, np.int32),
        "sns_ind_hf": np.zeros(n, np.int32),
        "sns_shape_j": np.zeros(n, np.int32),
        "sns_gind": np.zeros(n, np.int32),
        "sns_ls_inda": np.zeros(n, np.int32),
        "sns_ls_indb": np.zeros(n, np.int32),
        "sns_index_joint_j": np.zeros(n, np.int32),
        "tns_num_tns_filters": np.zeros(n, np.int32),
        "tns_rc_order": np.zeros((n, 2), np.int32),
        "tns_rc_i": np.zeros((n, 16), np.int32),
        "ltpf_pitch_present": np.zeros(n, np.uint8),
        "ltpf_ltpf_active": np.zeros(n, np.uint8),
        "ltpf_pitch_index": np.zeros(n, np.int32),
        "quant_lastnz_trunc": np.zeros(n, np.int32),
        "quant_gg_ind": np.zeros(n, np.int32),
        "quant_nbits_lsb": np.zeros(n, np.int32),
        "quant_lsb_mode": np.zeros(n, np.uint8),
        "noise_factor": np.zeros(n, np.int32),
        "x_q": np.zeros((n, ne), np.int32),
        "residual_bits": np.zeros((n, ne), np.uint8),
        "n_residual": np.zeros(n, np.int32),
    }
    nbits_bw = captured[0]["nbits_bw"]
    rate_flag = int(captured[0]["spec"].rate_flag)
    lpcw = int(captured[0]["tns"].lpc_weighting)
    for i, c in enumerate(captured):
        sns, tns, ltpf, spec = c["sns"], c["tns"], c["ltpf"], c["spec"]
        f["bandwidth"][i] = c["bw"]
        f["sns_ind_lf"][i] = sns.ind_lf
        f["sns_ind_hf"][i] = sns.ind_hf
        f["sns_shape_j"][i] = sns.shape_j
        f["sns_gind"][i] = sns.gind
        f["sns_ls_inda"][i] = sns.ls_inda
        f["sns_ls_indb"][i] = getattr(sns, "ls_indb", 0)
        f["sns_index_joint_j"][i] = sns.index_joint_j
        f["tns_num_tns_filters"][i] = tns.num_tns_filters
        f["tns_rc_order"][i] = np.asarray(tns.rc_order[:2], np.int32)
        f["tns_rc_i"][i] = np.asarray(tns.rc_i[:16], np.int32)
        f["ltpf_pitch_present"][i] = int(ltpf.pitch_present)
        f["ltpf_ltpf_active"][i] = int(ltpf.ltpf_active)
        f["ltpf_pitch_index"][i] = ltpf.pitch_index
        f["quant_lastnz_trunc"][i] = spec.lastnz_trunc
        f["quant_gg_ind"][i] = spec.gg_ind
        f["quant_nbits_lsb"][i] = spec.nbits_lsb
        f["quant_lsb_mode"][i] = int(spec.lsb_mode)
        f["noise_factor"][i] = c["noise"]
        f["x_q"][i] = c["x_q"]
        # oracle residual bits arrive in nonzero-line order; the native
        # packer wants them spectrally aligned
        pos = np.flatnonzero(c["x_q"])
        res = np.asarray(c["residual"], np.uint8)
        f["residual_bits"][i, pos[: len(res)]] = res[: len(pos)]
        f["n_residual"][i] = len(res)
    return {"nbits_bw": nbits_bw, "rate_flag": rate_flag, "lpcw": lpcw,
            **f}, payloads


def main() -> None:
    from lc3jax.config import FrameDuration, Lc3Config

    path_a, path_b = sys.argv[1], sys.argv[2]
    n_streams = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 12

    cfg = Lc3Config.new(int(os.environ.get("LC3JAX_FS", "48000")),
                        FrameDuration.MS7P5
                        if os.environ.get("LC3JAX_DUR", "10") in ("7.5", "7p5")
                        else FrameDuration.MS10)
    nbytes = int(os.environ.get("LC3JAX_NBYTES", "150"))
    rng = np.random.default_rng(0)
    t = np.arange(cfg.nf) / cfg.fs
    contents = [
        (8000 * np.sin(2 * np.pi * 220 * t)).astype(np.int16),
        (3000 * np.sin(2 * np.pi * 997 * t)
         + 500 * rng.standard_normal(cfg.nf)).astype(np.int16),
        (1500 * rng.standard_normal(cfg.nf)).astype(np.int16),
        (6000 * np.sin(2 * np.pi * 97 * t)).astype(np.int16),
    ]
    fields, payloads = oracle_fields(cfg, nbytes, contents)
    assert n_streams % len(contents) == 0, (
        f"n_streams={n_streams} must be a multiple of {len(contents)}: the "
        "field arrays are tiled whole-content-set, and passing a larger S "
        "to lc3_pack_frames would read past them")
    reps = n_streams // len(contents)
    tiled = {k: (np.ascontiguousarray(np.tile(v, (reps,) + (1,) * (v.ndim - 1)))
                 if isinstance(v, np.ndarray) else v)
             for k, v in fields.items()}
    want = np.frombuffer(b"".join(payloads * reps), np.uint8).reshape(
        n_streams, nbytes)

    libs = [load_lib(path_a), load_lib(path_b)]
    outs = [np.zeros((n_streams, nbytes), np.uint8) for _ in range(2)]
    nt = os.cpu_count() or 1

    def run(i: int) -> float:
        t0 = time.perf_counter()
        rej = libs[i].lc3_pack_frames(
            n_streams, nbytes, cfg.ne, nt,
            tiled["bandwidth"], fields["nbits_bw"],
            tiled["sns_ind_lf"], tiled["sns_ind_hf"], tiled["sns_shape_j"],
            tiled["sns_gind"], tiled["sns_ls_inda"], tiled["sns_ls_indb"],
            tiled["sns_index_joint_j"], tiled["tns_num_tns_filters"],
            fields["lpcw"], tiled["tns_rc_order"], tiled["tns_rc_i"],
            tiled["ltpf_pitch_present"], tiled["ltpf_ltpf_active"],
            tiled["ltpf_pitch_index"], tiled["quant_lastnz_trunc"],
            tiled["quant_gg_ind"], fields["rate_flag"],
            tiled["quant_nbits_lsb"], tiled["quant_lsb_mode"],
            tiled["noise_factor"], tiled["x_q"], tiled["residual_bits"],
            tiled["n_residual"], outs[i],
        )
        dt = time.perf_counter() - t0
        assert rej == 0, f"variant {i} rejected {rej} frames"
        return dt

    run(0), run(1)  # warm both
    for i, p in enumerate((path_a, path_b)):
        assert np.array_equal(outs[i], want), \
            f"{p}: pack output differs from the oracle payloads"

    best = [float("inf"), float("inf")]
    wins = [0, 0]
    ratios = []
    for _ in range(rounds):
        ta, tb = run(0), run(1)
        best[0] = min(best[0], ta)
        best[1] = min(best[1], tb)
        wins[ta > tb] += 1
        ratios.append(tb / ta)
    fsec = cfg.nf / cfg.fs
    for name, b in ((path_a, best[0]), (path_b, best[1])):
        print(f"{name}: best {b*1e3:.2f} ms  "
              f"{n_streams*fsec/b:.0f}x realtime/core")
    print(f"paired wins A:B = {wins[0]}:{wins[1]}  "
          f"best ratio B/A = {best[1]/best[0]:.3f}  "
          f"median paired B/A = {float(np.median(ratios)):.3f}  "
          f"loadavg {os.getloadavg()[0]:.2f}")


if __name__ == "__main__":
    main()
