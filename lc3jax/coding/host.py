"""Host-side batched bitstream parse/pack bridging frames <-> device tensors.

`parse_frames` turns a batch of encoded frames into the fixed-shape integer
arrays consumed by lc3jax.dsp.decoder (ParsedFrames); corrupt frames are
flagged for on-device PLC rather than raising. MPVQ de-enumeration happens
here (integer-only, part of the bitstream domain).
"""

from __future__ import annotations

import numpy as np

from ..config import FrameDuration, Lc3Config
from ..dsp.decoder import ParsedFrames
from ..ref import decoder_stages as stages
from ..ref.arithmetic import ArithmeticDecodeError, decode as arith_decode
from ..ref.bitstream import BitstreamError, BufferReader
from ..ref.side_info import SideInfoError, read_side_info


def parse_frames(cfg: Lc3Config, payloads: list[bytes]) -> ParsedFrames:
    """Parse a batch of per-stream frames into device-ready arrays."""
    S = len(payloads)
    ne = cfg.ne
    x_int = np.zeros((S, ne), np.int32)
    lsb_mode = np.zeros(S, bool)
    gg_ind = np.zeros(S, np.int32)
    rc_order = np.zeros((S, 2), np.int32)
    rc_i = np.zeros((S, 16), np.int32)
    bandwidth = np.zeros(S, np.int32)
    noise_factor = np.zeros(S, np.int32)
    nf_seed = np.zeros(S, np.int32)
    zero_frame = np.zeros(S, bool)
    residual_bits = np.zeros((S, ne), bool)
    n_residual = np.zeros(S, np.int32)
    sns_y = np.zeros((S, 16), np.int32)
    sns_shape = np.zeros(S, np.int32)
    sns_gind = np.zeros(S, np.int32)
    sns_ind_lf = np.zeros(S, np.int32)
    sns_ind_hf = np.zeros(S, np.int32)
    ltpf_active = np.zeros(S, bool)
    pitch_index = np.zeros(S, np.int32)
    bad_frame = np.zeros(S, bool)

    for s, buf in enumerate(payloads):
        try:
            reader = BufferReader()
            side = read_side_info(buf, reader, cfg.fs_ind, ne)
            x = [0] * ne
            arith = arith_decode(
                buf, reader, cfg.fs_ind, ne, side,
                cfg.n_ms == FrameDuration.MS7P5, x,
            )
        except (SideInfoError, ArithmeticDecodeError, BitstreamError):
            bad_frame[s] = True
            continue

        x_int[s] = x
        lsb_mode[s] = side.lsb_mode
        gg_ind[s] = side.global_gain_index
        rc_order[s] = arith.reflect_coef_order
        rc_i[s] = arith.reflect_coef_ints
        bandwidth[s] = side.bandwidth
        noise_factor[s] = side.noise_factor
        nf_seed[s] = arith.noise_filling_seed
        zero_frame[s] = arith.is_zero_frame
        nres = len(arith.residual_bits)
        # aligned at the spectral line of each nonzero coefficient (not rank
        # order) so the device-side residual_apply needs no gather
        pos = np.flatnonzero(np.asarray(x, np.int64))[:nres]
        residual_bits[s, pos] = arith.residual_bits
        n_residual[s] = nres

        sns = side.sns_vq
        shape_j = (sns.submode_msb << 1) + sns.submode_lsb
        if shape_j == 0:
            y = stages.mpvq_deenum(10, 10, sns.ls_inda, sns.idx_a) + [0] * 6
            y[10:16] = stages.mpvq_deenum(6, 1, sns.ls_indb, sns.idx_b)[:6]
        elif shape_j == 1:
            y = stages.mpvq_deenum(10, 10, sns.ls_inda, sns.idx_a) + [0] * 6
        elif shape_j == 2:
            y = stages.mpvq_deenum(16, 8, sns.ls_inda, sns.idx_a)
        else:
            y = stages.mpvq_deenum(16, 6, sns.ls_inda, sns.idx_a)
        sns_y[s] = y
        sns_shape[s] = shape_j
        sns_gind[s] = sns.g_ind
        sns_ind_lf[s] = sns.ind_lf
        sns_ind_hf[s] = sns.ind_hf
        ltpf_active[s] = side.ltpf.is_active
        pitch_index[s] = side.ltpf.pitch_index

    return ParsedFrames(
        x_int=x_int,
        lsb_mode=lsb_mode,
        gg_ind=gg_ind,
        rc_order=rc_order,
        rc_i=rc_i,
        bandwidth=bandwidth,
        noise_factor=noise_factor,
        nf_seed=nf_seed,
        zero_frame=zero_frame,
        residual_bits=residual_bits,
        n_residual=n_residual,
        sns_y=sns_y,
        sns_shape=sns_shape,
        sns_gind=sns_gind,
        sns_ind_lf=sns_ind_lf,
        sns_ind_hf=sns_ind_hf,
        ltpf_active=ltpf_active,
        pitch_index=pitch_index,
        bad_frame=bad_frame,
    )


def pack_frames(cfg: Lc3Config, fields: dict, nbytes: int) -> list[bytes]:
    """Pack device-produced encoder fields into LC3 frames (range coder).

    `fields` is the dict returned by lc3jax.dsp.encoder.encode_step, with
    arrays already fetched to host.
    """
    from types import SimpleNamespace as NS

    from ..ref.bitstream_enc import BitstreamEncoder

    f = {k: np.asarray(v) for k, v in fields.items()}
    for k in ("x_q", "residual_bits"):  # may arrive flattened (see native.py)
        if f[k].ndim == 1:
            f[k] = f[k].reshape(-1, cfg.ne)
    S = f["x_q"].shape[0]
    out = []
    be = BitstreamEncoder(cfg.ne)
    for s in range(S):
        sns = NS(
            ind_lf=int(f["sns_ind_lf"][s]), ind_hf=int(f["sns_ind_hf"][s]),
            shape_j=int(f["sns_shape_j"][s]), gind=int(f["sns_gind"][s]),
            ls_inda=int(f["sns_ls_inda"][s]), ls_indb=int(f["sns_ls_indb"][s]),
            index_joint_j=int(f["sns_index_joint_j"][s]),
        )
        tns = NS(
            num_tns_filters=int(f["tns_num_tns_filters"][s]),
            rc_order=[int(v) for v in f["tns_rc_order"][s]],
            rc_i=[int(v) for v in f["tns_rc_i"][s]],
            lpc_weighting=int(f["tns_lpc_weighting"])
            if np.ndim(f["tns_lpc_weighting"]) == 0
            else int(f["tns_lpc_weighting"][s]),
        )
        ltpf = NS(
            pitch_present=bool(f["ltpf_pitch_present"][s]),
            ltpf_active=bool(f["ltpf_ltpf_active"][s]),
            pitch_index=int(f["ltpf_pitch_index"][s]),
        )
        spec = NS(
            lastnz_trunc=int(f["quant_lastnz_trunc"][s]),
            lsb_mode=bool(f["quant_lsb_mode"][s]),
            gg_ind=int(f["quant_gg_ind"][s]),
            rate_flag=int(f["quant_rate_flag"])
            if np.ndim(f["quant_rate_flag"]) == 0
            else int(f["quant_rate_flag"][s]),
            nbits_lsb=int(f["quant_nbits_lsb"][s]),
        )
        nres = int(f["n_residual"][s])
        # residual_bits is spectrally aligned; emit in nonzero-line order
        pos = np.flatnonzero(f["x_q"][s])[:nres]
        res_bits = [bool(b) for b in f["residual_bits"][s][pos]]
        out.append(
            be.encode(
                int(f["bandwidth"][s]), int(f["nbits_bw"]), sns, tns, ltpf, spec,
                res_bits, int(f["noise_factor"][s]),
                f["x_q"][s].astype(np.int16), nbytes,
            )
        )
    return out
