"""Pallas TNS lattice kernels vs the lax.scan formulations (interpret mode
on CPU; the compiled kernels are the TPU defaults in decode_step /
tns_analysis_batch)."""

import jax
import numpy as np

from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.dsp.decoder import tns_synthesis
from lc3jax.dsp.encoder import encoder_params, tns_analysis_batch
from lc3jax.dsp.pallas_tns import tns_analysis_pallas, tns_synthesis_pallas
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


def test_pallas_tns_analysis_matches_scan():
    cfg = Lc3Config.new(48000, FrameDuration.MS10)
    p = encoder_params(cfg)
    rng = np.random.default_rng(1)
    S = 128
    x = (rng.standard_normal((S, cfg.ne)) * 1000).astype(np.float32)
    bw = rng.integers(0, 5, S).astype(np.int32)
    nn = np.zeros(S, bool)
    nbits = 1200

    ref_x, ref_f = jax.jit(
        lambda xx, bb, mm: tns_analysis_batch(p, xx, bb, nbits, mm, use_pallas=False)
    )(x, bw, nn)

    def pallas_path(x, bw, nn):
        # reproduce the analysis front half, then the Pallas lattice
        xf, fields = tns_analysis_batch(p, x, bw, nbits, nn, use_pallas=False)
        sub_bounds = np.asarray(p.tns_bounds, np.int32)
        bounds = jax.numpy.asarray(sub_bounds)[bw]
        num_filters = jax.numpy.where(bw >= 3, 2, 1)
        sin_tab = np.sin(np.pi / 17.0 * (np.arange(17) - 8.0)).astype(np.float32)
        sin_tab[8] = 0.0
        rc_q = jax.numpy.asarray(sin_tab)[fields["rc_i"]]
        out = tns_analysis_pallas(
            p, x, bounds, fields["rc_order"], num_filters, rc_q, interpret=True
        )
        return out, fields

    pal_x, pal_f = jax.jit(pallas_path)(x, bw, nn)
    assert np.array_equal(np.asarray(ref_x), np.asarray(pal_x))
