"""Pallas TNS lattice kernel vs the lax.scan formulation (interpret mode on
CPU; the compiled kernel runs on TPU via decode_step(use_pallas=True))."""

import jax
import numpy as np

from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.dsp.decoder import tns_synthesis
from lc3jax.dsp.pallas_tns import tns_synthesis_pallas
from lc3jax.dsp.params import decoder_params


def test_pallas_tns_matches_scan():
    cfg = Lc3Config.new(48000, FrameDuration.MS10)
    p = decoder_params(cfg)
    rng = np.random.default_rng(0)
    S = 128
    x = (rng.standard_normal((S, cfg.ne)) * 1000).astype(np.float32)
    bw = rng.integers(0, 5, S).astype(np.int32)
    rc_order = np.stack([rng.integers(0, 9, S), rng.integers(0, 9, S)], 1).astype(np.int32)
    rc_i = rng.integers(0, 17, (S, 16)).astype(np.int32)
    ref = np.asarray(jax.jit(lambda *a: tns_synthesis(p, *a))(x, bw, rc_order, rc_i))
    pal = np.asarray(
        jax.jit(lambda *a: tns_synthesis_pallas(p, *a, interpret=True))(x, bw, rc_order, rc_i)
    )
    assert np.array_equal(ref, pal)
