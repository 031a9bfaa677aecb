"""lanecaps: generation-keyed Pallas lane-width caps (ADVICE round 4).

The measured-best widths (probed on TPU v5e at the ne=400/nbytes=400 worst
case) must only apply on probed generations; everything else — including
the CPU interpreter these tests run on — falls back to the conservative
512-lane width the old analytic VMEM estimates admitted everywhere.
"""

from unittest import mock

from lc3jax import lanecaps
from lc3jax.lanecaps import lane_cap


def test_cpu_falls_back_to_conservative():
    # tests run on the CPU backend: device_kind is not a probed TPU
    assert lane_cap("parse") == 512
    assert lane_cap("bitmodel") == 512
    assert lane_cap("pack") == 512


def test_probed_generation_gets_measured_best():
    class _Dev:
        device_kind = "TPU v5 lite"

    with mock.patch("jax.devices", return_value=[_Dev()]):
        assert lane_cap("parse") == 2048
        assert lane_cap("bitmodel") == 2048
        # pack's measured-best is BELOW the others: 2048 was 24% slower
        assert lane_cap("pack") == 1024


def test_unknown_tpu_generation_is_capped():
    class _Dev:
        device_kind = "TPU v7x"

    with mock.patch("jax.devices", return_value=[_Dev()]):
        for k in ("parse", "bitmodel", "pack"):
            assert lane_cap(k) == 512


def test_caps_never_exceed_measured_best():
    for k, best in lanecaps._MEASURED_BEST.items():
        assert lane_cap(k) <= best
