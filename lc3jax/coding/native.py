"""ctypes bindings for the native (C++) host bitstream codec.

Falls back transparently to the Python reference path when the shared
library hasn't been built (native/build.sh builds it; the repo ships a
prebuilt .so for linux-x86_64 in lc3jax/data/).
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

from .. import tables as T
from ..config import FrameDuration, Lc3Config
from ..dsp.decoder import ParsedFrames

_LIB_PATH = Path(__file__).parent.parent / "data" / "liblc3bitstream.so"
_lib = None


def available() -> bool:
    return load() is not None


def load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
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
    lib.lc3_pack_frames.restype = ctypes.c_int  # frames rejected (zeroed)
    lib.lc3_pack_frames.argtypes = (
        [ctypes.c_int] * 4
        + [c32, ctypes.c_int]
        + [c32] * 8
        + [ctypes.c_int, c32, c32, cu8, cu8, c32, c32, c32, ctypes.c_int,
           c32, cu8, c32, c32, cu8, c32, cu8]
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
    _lib = lib
    return _lib


_parse_buffers: dict = {}


def _alloc_parse_buffers(S: int, ne: int):
    return (
        np.zeros((S, ne), np.int32), np.zeros(S, np.uint8), np.zeros(S, np.int32),
        np.zeros((S, 2), np.int32), np.zeros((S, 16), np.int32),
        np.zeros(S, np.int32), np.zeros(S, np.int32), np.zeros(S, np.int32),
        np.zeros(S, np.uint8), np.zeros((S, ne), np.uint8), np.zeros(S, np.int32),
        np.zeros((S, 16), np.int32), np.zeros(S, np.int32), np.zeros(S, np.int32),
        np.zeros(S, np.int32), np.zeros(S, np.int32), np.zeros(S, np.uint8),
        np.zeros(S, np.int32), np.zeros(S, np.uint8),
    )


def parse_frames_native(
    cfg: Lc3Config, payloads: np.ndarray, n_threads: int = 8
) -> ParsedFrames:
    """payloads: uint8 [S, nbytes]. Returns ParsedFrames (host numpy).

    Output buffers are cached per (S, ne) and reused across calls; callers
    must consume (or copy/device_put) the result before the next call."""
    lib = load()
    assert lib is not None, "native bitstream library not built"
    payloads = np.ascontiguousarray(payloads, np.uint8)
    S, nbytes = payloads.shape
    ne = cfg.ne
    # ring of buffer sets: callers (incl. prefetch pipelines) may still be
    # transferring the previous result to a device when the next parse runs
    key = (S, ne)
    ring = _parse_buffers.get(key)
    if ring is None:
        ring = [[_alloc_parse_buffers(S, ne) for _ in range(4)], 0]
        _parse_buffers[key] = ring
    bufs = ring[0][ring[1]]
    ring[1] = (ring[1] + 1) % 4
    (x, lsb_mode, gg_ind, rc_order, rc_i, bandwidth, noise_factor, nf_seed,
     zero_frame, residual_bits, n_residual, sns_y, sns_shape, sns_gind,
     sns_ind_lf, sns_ind_hf, ltpf_active, pitch_index, bad_frame) = bufs
    lib.lc3_parse_frames(
        payloads, S, nbytes, cfg.fs_ind, ne,
        1 if cfg.n_ms == FrameDuration.MS7P5 else 0, n_threads,
        x, lsb_mode, gg_ind, rc_order, rc_i, bandwidth, noise_factor, nf_seed,
        zero_frame, residual_bits, n_residual, sns_y, sns_shape, sns_gind,
        sns_ind_lf, sns_ind_hf, ltpf_active, pitch_index, bad_frame,
    )
    return ParsedFrames(
        x_int=x, lsb_mode=lsb_mode.astype(bool), gg_ind=gg_ind,
        rc_order=rc_order, rc_i=rc_i, bandwidth=bandwidth,
        noise_factor=noise_factor, nf_seed=nf_seed,
        zero_frame=zero_frame.astype(bool),
        residual_bits=residual_bits.astype(bool), n_residual=n_residual,
        sns_y=sns_y, sns_shape=sns_shape, sns_gind=sns_gind,
        sns_ind_lf=sns_ind_lf, sns_ind_hf=sns_ind_hf,
        ltpf_active=ltpf_active.astype(bool), pitch_index=pitch_index,
        bad_frame=bad_frame.astype(bool),
    )


def pack_frames_native(cfg: Lc3Config, fields: dict, nbytes: int,
                       n_threads: int = 8) -> np.ndarray:
    """Pack device-produced encoder fields -> uint8 [S, nbytes]."""
    lib = load()
    assert lib is not None, "native bitstream library not built"
    f = {k: np.asarray(v) for k, v in fields.items()}
    ne = cfg.ne
    # x_q / residual_bits may arrive flattened to rank-1: encode-step jits
    # that feed the host packer return them reshaped (serving.BatchEncoder)
    # because a rank-1 jit output always fetches dense, while the [S, ne]
    # output's device layout is padded/tiled and its host view is
    # non-contiguous — the per-call ascontiguousarray copy of ~4 MB cost
    # ~35% of the whole pack step (measured round 5: 3,053x -> 4,362x/core)
    for k in ("x_q", "residual_bits"):
        if f[k].ndim == 1:
            f[k] = f[k].reshape(-1, ne)
    S = f["x_q"].shape[0]
    out = np.zeros((S, nbytes), np.uint8)
    i32 = lambda k: np.ascontiguousarray(f[k], np.int32)
    u8 = lambda k: np.ascontiguousarray(f[k], np.uint8)
    n_rejected = lib.lc3_pack_frames(
        S, nbytes, ne, n_threads,
        i32("bandwidth"), int(f["nbits_bw"]),
        i32("sns_ind_lf"), i32("sns_ind_hf"), i32("sns_shape_j"),
        i32("sns_gind"), i32("sns_ls_inda"), i32("sns_ls_indb"),
        i32("sns_index_joint_j"), i32("tns_num_tns_filters"),
        int(f["tns_lpc_weighting"]), i32("tns_rc_order"), i32("tns_rc_i"),
        u8("ltpf_pitch_present"), u8("ltpf_ltpf_active"),
        i32("ltpf_pitch_index"), i32("quant_lastnz_trunc"),
        i32("quant_gg_ind"), int(np.asarray(f["quant_rate_flag"]).reshape(-1)[0]),
        i32("quant_nbits_lsb"), u8("quant_lsb_mode"), i32("noise_factor"),
        i32("x_q"), u8("residual_bits"), i32("n_residual"), out,
    )
    if n_rejected:
        # inconsistent fields are an encode-path programming error, never a
        # data-dependent condition — fail loudly rather than emit zero frames
        raise ValueError(
            f"native pack rejected {n_rejected}/{S} frames (inconsistent "
            "encoder fields; rejected rows zeroed)"
        )
    return out
