"""Per-kernel Pallas lane-width caps, keyed on the TPU generation.

Round 4 dropped the analytic scoped-VMEM lane caps (every kernel's formula
over-predicted Mosaic's real demand ~2x) in favor of compile-probed caps
measured on TPU v5e at the binding worst case (ne=400, nbytes=400, S=2048):
parse 2048, bitmodel 2048, pack 1024 (2048 measured 24% slower — it stops
scaling). Those probes are generation-specific: on an unprobed TPU
generation a max-width lane block may exceed scoped VMEM and fail Mosaic
compilation with no automatic fallback — pallas_call compile errors surface
at outer-jit compile time, where a try/except around the traced call cannot
catch them (ADVICE round 4). So the caps are keyed on
``jax.devices()[0].device_kind``: probed generations get the measured-best
width; unknown generations (and CPU interpret runs) fall back to 512 lanes,
the widest width the old conservative analytic VMEM estimates admitted for
every kernel at the worst-case geometry. The explicit ``lanes=`` kwarg on
each kernel entry always overrides.
"""

from __future__ import annotations

# the v5e chip this repo was probed on reports "TPU v5 lite"; keep both
# spellings in case a runtime reports the marketing name
_PROBED_KINDS = {"tpu v5 lite", "tpu v5e"}

_MEASURED_BEST = {"parse": 2048, "bitmodel": 2048, "pack": 1024}
_CONSERVATIVE = 512


def lane_cap(kernel: str) -> int:
    """Max lane width for `kernel` ("parse" | "bitmodel" | "pack") on the
    current default device. Cheap (no compile); safe to call at trace time."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    best = _MEASURED_BEST[kernel]
    if kind in _PROBED_KINDS:
        return best
    return min(best, _CONSERVATIVE)
