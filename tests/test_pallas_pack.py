"""Device range-encoder (pallas_pack) parity.

Three layers of evidence, matching the golden discipline of
/root/reference/src/lc3_encoder.rs:312-369:

1. Interpret-mode byte-exactness on CPU at the smallest geometry
   (8 kHz/7.5 ms, the parse kernel's trick): the kernel, run through the
   Pallas interpreter, must reproduce the host packer byte-for-byte on
   mixed content — zero frames, loud noise, pitched tones — and on an
   lsb_mode-heavy batch.
2. An adversarial algorithm test of the optimistic-carry emission scheme
   (the kernel's replacement for the reference's cache/carry_count drain,
   encoder/bitstream_encoding.rs:397-415): a numpy mirror of the kernel's
   slot-write + group-mark + fix-up machinery runs in lockstep with the
   bit-exact oracle coder on constructed symbol streams that force the
   knife edges — chained 0xFF pending runs closed by a carry, the headless
   first group (pendings before any cache byte), and the ac_enc_finish
   mask/need-extra branch.
3. Full-rate byte-exactness on real TPU hardware (48 kHz/150 B here;
   tools/tpu_parity.py --full covers the 20 B/400 B/7.5 ms envelope).
"""

from functools import partial

import numpy as np
import pytest

from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.ref.bitstream_enc import BackForthWriter, BitstreamEncoder

CFG48 = Lc3Config.new(48000, FrameDuration.MS10)
CFG8 = Lc3Config.new(8000, FrameDuration.MS7P5)


def _fields(cfg, nbytes, S=128, seed=7, steps=2, loud=False):
    import jax

    from lc3jax.dsp.encoder import encode_step, encoder_init

    rng = np.random.default_rng(seed)
    t = np.arange(cfg.nf) / cfg.fs
    kinds = []
    for i in range(S):
        m = i % 4
        if m == 0:
            sig = (np.zeros(cfg.nf) if not loud
                   else 32000 * rng.standard_normal(cfg.nf))
        elif m == 1:
            sig = 28000 * rng.standard_normal(cfg.nf)  # lsb-heavy
        elif m == 2:
            sig = 15000 * np.sin(2 * np.pi * (220 + 37 * (i % 11)) * t)
        else:
            sig = rng.normal(0, 30, cfg.nf)
        kinds.append(np.clip(sig, -32768, 32767).astype(np.int16))
    pcm = np.stack(kinds)
    state = encoder_init(cfg, S)
    step = jax.jit(partial(encode_step, cfg, nbytes, emit_pack=True))
    for _ in range(steps):
        state, fields = step(state, pcm)
    return fields


def _assert_pack_parity(cfg, nbytes, fields, interpret):
    import jax

    from lc3jax.coding.host import pack_frames
    from lc3jax.coding.pallas_pack import device_pack

    host_fields = {k: np.asarray(v) for k, v in fields.items()
                   if k != "quant_pack_tables"}
    want = pack_frames(cfg, host_fields, nbytes)
    if interpret:
        got = np.asarray(device_pack(cfg, nbytes, fields, interpret=True))
    else:
        got = np.asarray(jax.jit(partial(device_pack, cfg, nbytes))(fields))
    for s in range(got.shape[0]):
        assert bytes(got[s]) == want[s], f"stream {s}"


def test_device_pack_interpret_mixed_8k():
    fields = _fields(CFG8, 40, seed=3)
    _assert_pack_parity(CFG8, 40, fields, interpret=True)


def test_device_pack_interpret_lsb_8k():
    fields = _fields(CFG8, 80, seed=11, loud=True, steps=3)
    assert int(np.asarray(fields["quant_lsb_mode"]).sum()) > 0, \
        "batch must exercise lsb_mode"
    _assert_pack_parity(CFG8, 80, fields, interpret=True)


def test_device_pack_byte_exact_on_tpu():
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("pack kernel parity at 48k needs a TPU backend "
                    "(covered on hardware by tools/tpu_parity.py)")
    fields = _fields(CFG48, 150)
    _assert_pack_parity(CFG48, 150, fields, interpret=False)


# --------------------------------------------------------------------------
# adversarial optimistic-carry algorithm test
# --------------------------------------------------------------------------


class _OptimisticCoder:
    """Numpy mirror of the kernel's range-coder emission scheme
    (coding/pallas_pack.py): optimistic slot writes, carried-group marks,
    disjoint end-of-frame fix-ups, final partial-byte clear."""

    def __init__(self):
        self.low = 0
        self.range = 0x00FFFFFF
        self.bp = 0
        self.carry = 0
        self.rstart = 0
        self.hasc = False
        self.hl0 = False
        self.slots = []
        self.ms = set()
        self.me = set()
        self.deepest_run = 0  # pendings zeroed by a carry (coverage stat)
        self.headless_carries = 0

    def _shift(self):
        flush = self.low < 0x00FF0000 or self.carry == 1
        if flush and self.carry == 1:
            self.ms.add(self.rstart)
            self.me.add(self.bp)
            pend = self.bp - self.rstart - (1 if self.hasc else 0)
            self.deepest_run = max(self.deepest_run, pend)
            if not self.hasc:
                self.hl0 = True
                self.headless_carries += 1
        self.slots.append(self.low >> 16)
        if flush:
            self.rstart = self.bp
            self.hasc = True
            self.carry = 0
        self.bp += 1
        self.low = (self.low << 8) & 0x00FFFFFF

    def encode(self, cum, frq):
        r = self.range >> 10
        self.low += r * cum
        if self.low >> 24:
            self.carry = 1
        self.low &= 0x00FFFFFF
        self.range = r * frq
        for _ in range(2):
            if self.range < 0x10000:
                self.range <<= 8
                self._shift()

    def finish(self):
        bits = 1
        while (self.range >> (24 - bits)) == 0:
            bits += 1
        mask = 0x00FFFFFF >> bits
        val = self.low + mask
        over1 = val >> 24
        high = self.low + self.range
        over2 = high >> 24
        val &= 0x00FFFFFF & ~mask
        if over1 == over2:
            if (val + mask) >= high:
                bits += 1
                mask >>= 1
                val = ((self.low + mask) & 0x00FFFFFF) & ~mask
            if val < self.low:
                self.carry = 1
        self.low = val
        brem = bits
        while brem > 0:
            self._shift()
            brem -= 8
        bits_fin = ((bits - 1) % 8) + 1
        self.slots[self.bp - 1] &= (~(0xFF >> bits_fin)) & 0xFF
        # disjoint carried-group fix-ups
        out = list(self.slots)
        open_g = False
        for p in range(self.bp):
            if p in self.me:
                open_g = False
            start = p in self.ms
            if start and p == 0 and self.hl0:
                out[0] = 0
            elif start:
                out[p] = (out[p] + 1) & 0xFF
            elif open_g:
                out[p] = 0
            if start:
                open_g = True
        return bytes(out)


def _oracle_coder(nbytes=600):
    enc = BitstreamEncoder(ne=2)
    enc.w = BackForthWriter(nbytes)
    enc.low = 0
    enc.range = 0x00FFFFFF
    enc.cache = -1
    enc.carry = 0
    enc.carry_count = 0
    return enc


def _run_pair(sym_source, n_sym):
    """Drive oracle + optimistic model in lockstep; the symbol source sees
    the live (low, range) so it can steer the coder adversarially."""
    enc = _oracle_coder()
    opt = _OptimisticCoder()
    for i in range(n_sym):
        cum, frq = sym_source(i, enc.low, enc.range)
        enc._ac_encode(cum, frq)
        opt.encode(cum, frq)
        assert (enc.low, enc.range) == (opt.low, opt.range), f"state @ {i}"
    enc._ac_finish()
    got = opt.finish()
    want = bytes(enc.w.buf[: enc.w.bp])
    # the oracle's final partial byte lives at buf[bp] (bp not advanced)
    want += bytes([enc.w.buf[enc.w.bp]])
    assert got == want, (got.hex(), want.hex())
    return opt


def test_optimistic_carry_chained_ff():
    """Steer low onto 0xFFxxxx at every renorm to chain pending bytes,
    then overflow: the fix-up must +1 the cache byte and zero the run."""

    def steer(i, low, range_):
        r = range_ >> 10
        if i % 7 == 6:
            return 1023, 1  # push toward overflow -> carry
        cum = min(1023, max(0, (0xFFFF80 - low) // max(r, 1)))
        return int(cum), 4
    opt = _run_pair(steer, 160)
    assert opt.deepest_run >= 3, \
        f"adversarial stream too shallow (pend run={opt.deepest_run})"


def test_optimistic_carry_headless_group():
    """Force pendings before any cache byte exists: the reference skips the
    cache write (cache<0), so the fix-up must zero the run without +1."""

    def steer(i, low, range_):
        if i == 0:
            return 1023, 4  # low jumps to ~0xFFB000: first shift pends
        if i < 3:
            return 1023, 4  # keep pushing until overflow sets carry
        return (i * 97) % 900, 3 + (i % 60)
    opt = _run_pair(steer, 80)
    assert opt.headless_carries >= 1, "headless-group path not exercised"


def test_optimistic_carry_random_streams():
    for seed in range(8):
        rng = np.random.default_rng(seed)

        def rand(i, low, range_, rng=rng):
            cum = int(rng.integers(0, 1000))
            frq = int(rng.integers(1, 1025 - cum)) if cum < 1024 else 1
            return cum, frq
        _run_pair(rand, 200)
