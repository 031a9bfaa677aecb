"""Verify extracted spec tables and re-derive the derivable ones."""

import numpy as np

from lc3jax import tables as T
from lc3jax.config import ALL_CONFIGS, FrameDuration, Lc3Config


def test_mpvq_offsets_recurrence():
    assert np.array_equal(T.gen_mpvq_offsets(), T.MPVQ_OFFSETS)


def test_dct16_matrix_closed_form():
    gen = T.gen_dct16_matrix()
    np.testing.assert_allclose(gen, T.DCT16, atol=2e-7)


def test_cumfreq_are_prefix_sums():
    # cum_freq[i] = sum of freq[:i] for every arithmetic-coder model
    for freq, cum in [
        (T.AC_SPEC_FREQ, T.AC_SPEC_CUMFREQ),
        (T.AC_TNS_ORDER_FREQ, T.AC_TNS_ORDER_CUMFREQ),
        (T.AC_TNS_COEF_FREQ, T.AC_TNS_COEF_CUMFREQ),
    ]:
        expected = np.concatenate(
            [np.zeros((freq.shape[0], 1), dtype=freq.dtype), np.cumsum(freq, axis=1)[:, :-1]],
            axis=1,
        )
        assert np.array_equal(expected, cum)


def test_spec_freq_models_sum_to_1024():
    assert np.all(T.AC_SPEC_FREQ.sum(axis=1) == 1024)


def test_config_geometry():
    cfg = Lc3Config.new(48000, FrameDuration.MS10)
    assert (cfg.fs, cfg.fs_ind, cfg.z, cfg.nf, cfg.nb, cfg.ne) == (48000, 4, 180, 480, 64, 400)
    cfg = Lc3Config.new(8000, FrameDuration.MS7P5)
    assert (cfg.nf, cfg.nb, cfg.ne, cfg.z) == (60, 60, 60, 14)


def test_band_indices_cover_spectrum():
    for cfg in ALL_CONFIGS:
        idx = T.band_indices(cfg)
        assert len(idx) == cfg.nb + 1
        assert idx[0] == 0 and idx[-1] == cfg.ne
        assert np.all(np.diff(idx) >= 1)


def test_windows_have_z_leading_zeros():
    for cfg in ALL_CONFIGS:
        w = T.mdct_window(cfg)
        assert w.shape == (2 * cfg.nf,)
        # the low-delay window ends with z zeros (read reversed by the codec)
        assert np.all(w[-cfg.z + 2 :] == 0.0)
