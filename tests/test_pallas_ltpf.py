"""Pallas LTPF kernel vs the lax.scan formulation (interpret mode on CPU).

The kernel reorders the FIR accumulations (left fold vs einsum), and the
IIR feedback recirculates the resulting ulps, so outputs are not bit-equal;
they must stay far below int16 rounding scale (the decoder's documented
TPU tolerance). Random +-0.2 denominator coefficients stress the feedback
well beyond real LTPF gains (<= 0.34)."""

import jax
import numpy as np

from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.dsp.ltpf import LtpfState, ltpf_run
from lc3jax.dsp.params import decoder_params


def _run_case(cfg, seed):
    p = decoder_params(cfg)
    rng = np.random.default_rng(seed)
    S = 256
    H = p.num_mem_blocks * p.nf
    jnp = jax.numpy
    st = LtpfState(
        hist_x=jnp.asarray(rng.standard_normal((S, H)).astype(np.float32) * 1000),
        hist_y=jnp.asarray(rng.standard_normal((S, H)).astype(np.float32) * 1000),
        c_num=jnp.asarray(rng.standard_normal((S, p.l_num + 1)).astype(np.float32) * 0.2),
        c_den=jnp.asarray(rng.standard_normal((S, p.l_den + 1)).astype(np.float32) * 0.2),
        p_int=jnp.asarray(rng.integers(18, 855, S).astype(np.int32)),
        p_fr=jnp.asarray(rng.integers(0, 4, S).astype(np.int32)),
        active=jnp.asarray(rng.integers(0, 2, S).astype(bool)),
    )
    x = jnp.asarray(rng.standard_normal((S, p.nf)).astype(np.float32) * 2000)
    active = jnp.asarray(rng.integers(0, 2, S).astype(bool))
    pitch_index = jnp.asarray(rng.integers(0, 512, S).astype(np.int32))

    f_ref = jax.jit(
        lambda st, x, a, pi: ltpf_run(p, st, x, 1200, a, pi, use_pallas=False)
    )
    f_pal = jax.jit(
        lambda st, x, a, pi: ltpf_run(
            p, st, x, 1200, a, pi, use_pallas=True, pallas_interpret=True
        )
    )
    ya, sa = f_ref(st, x, active, pitch_index)
    yb, sb = f_pal(st, x, active, pitch_index)
    return np.asarray(ya), np.asarray(yb)


def test_pallas_ltpf_matches_scan_48k():
    ya, yb = _run_case(Lc3Config.new(48000, FrameDuration.MS10), 7)
    d = np.abs(ya - yb)
    assert d.max() < 0.01, d.max()  # << 0.5 LSB: int16 rounding unaffected
    assert (d > 0.5).sum() == 0


def test_pallas_ltpf_matches_scan_32k_7p5ms():
    ya, yb = _run_case(Lc3Config.new(32000, FrameDuration.MS7P5), 11)
    d = np.abs(ya - yb)
    assert d.max() < 0.01, d.max()
    assert (d > 0.5).sum() == 0
