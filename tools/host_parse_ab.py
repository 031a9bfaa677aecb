#!/usr/bin/env python3
"""Interleaved A/B harness for native parser variants (no jax).

Loads two builds of liblc3bitstream.so in ONE process and alternates
timed parse batches A,B,A,B,... so host-level noise (cpufreq, neighbor
VMs, cache state) hits both variants equally. Reports best-of and the
paired per-round ratio. This container's run-to-run wall clock varies
+/-30%, so separate-process timing cannot resolve <2x differences.

Usage: python tools/host_parse_ab.py A.so B.so [n_streams] [rounds]
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
    lib.lc3_parse_frames.restype = ctypes.c_int
    lib.lc3_parse_frames.argtypes = (
        [cu8] + [ctypes.c_int] * 6
        + [c32, cu8, c32, c32, c32, c32, c32, c32, cu8, cu8, c32, c32, c32,
           c32, c32, c32, cu8, c32, cu8]
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


def main() -> None:
    from lc3jax.config import FrameDuration, Lc3Config
    from lc3jax.coding.native import _alloc_parse_buffers
    from lc3jax.ref.encoder import Lc3Encoder

    path_a, path_b = sys.argv[1], sys.argv[2]
    n_streams = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 12

    cfg = Lc3Config.new(48000, FrameDuration.MS10)
    nbytes = 150
    rng = np.random.default_rng(0)
    enc = Lc3Encoder(4, cfg.n_ms, cfg.fs)
    t = np.arange(cfg.nf) / cfg.fs
    contents = [
        (8000 * np.sin(2 * np.pi * 220 * t)).astype(np.int16),
        (3000 * np.sin(2 * np.pi * 997 * t)
         + 500 * rng.standard_normal(cfg.nf)).astype(np.int16),
        (1500 * rng.standard_normal(cfg.nf)).astype(np.int16),
        (6000 * np.sin(2 * np.pi * 97 * t)).astype(np.int16),
    ]
    payloads = [bytes(enc.encode_frame(ch, pcm, nbytes))
                for ch, pcm in enumerate(contents)]
    batch = np.ascontiguousarray(np.frombuffer(
        b"".join(payloads[s % 4] for s in range(n_streams)), np.uint8
    ).reshape(n_streams, nbytes))

    libs = [load_lib(path_a), load_lib(path_b)]
    bufs = [_alloc_parse_buffers(n_streams, cfg.ne) for _ in range(2)]
    is75 = 1 if cfg.n_ms == FrameDuration.MS7P5 else 0

    def run(i: int) -> float:
        t0 = time.perf_counter()
        libs[i].lc3_parse_frames(
            batch, n_streams, nbytes, cfg.fs_ind, cfg.ne, is75,
            os.cpu_count() or 1, *bufs[i],
        )
        return time.perf_counter() - t0

    run(0), run(1)  # warm both
    assert all(np.array_equal(a, b) for a, b in zip(bufs[0], bufs[1])), \
        "variants disagree on parse output"

    best = [float("inf"), float("inf")]
    wins = [0, 0]
    for r in range(rounds):
        ta, tb = run(0), run(1)
        best[0] = min(best[0], ta)
        best[1] = min(best[1], tb)
        wins[ta > tb] += 1
    fsec = cfg.nf / cfg.fs
    for name, b in ((path_a, best[0]), (path_b, best[1])):
        print(f"{name}: best {b*1e3:.2f} ms  "
              f"{n_streams*fsec/b:.0f}x realtime/core")
    print(f"paired wins A:B = {wins[0]}:{wins[1]}  "
          f"best ratio B/A = {best[1]/best[0]:.3f}  "
          f"loadavg {os.getloadavg()[0]:.2f}")


if __name__ == "__main__":
    main()
