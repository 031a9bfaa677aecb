#!/usr/bin/env python3
"""Per-kernel device microbenchmarks for the encode path.

Times each Pallas kernel of the fused encoder in isolation (device clock
via lc3jax.profiling.device_step_ms — host wall-clock cannot time device
work here, see CLAUDE.md) so kernel-level optimizations can be measured
without re-running the whole pipeline. Inputs are REAL mid-pipeline
tensors captured from one encode_step, so trip counts (gmax, lastnz)
match production statistics rather than worst-case padding.

Usage: python tools/kernel_bench.py [S] [kernel ...]
  kernels: bitmodel bitmodel_pack pack sns tns all (default all)
"""

from __future__ import annotations

import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    which = set(sys.argv[2:]) or {"all"}

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lc3jax-xla-cache-tpu")

    from lc3jax.config import FrameDuration, Lc3Config
    from lc3jax.dsp.encoder import encode_step, encoder_init
    from lc3jax.profiling import device_step_ms
    from lc3jax.ref.encoder import Lc3Encoder

    fs = int(os.environ.get("LC3JAX_FS", "48000"))
    dur = (FrameDuration.MS7P5 if os.environ.get("LC3JAX_DUR", "10") in
           ("7.5", "7p5") else FrameDuration.MS10)
    cfg = Lc3Config.new(fs, dur)
    nbytes = int(os.environ.get("LC3JAX_NBYTES", "150"))
    frame_seconds = cfg.nf / cfg.fs

    rng = np.random.default_rng(0)
    enc = Lc3Encoder(4, cfg.n_ms, cfg.fs)
    t = np.arange(cfg.nf) / cfg.fs
    contents = [
        (8000 * np.sin(2 * np.pi * 220 * t)).astype(np.int16),
        (3000 * np.sin(2 * np.pi * 997 * t)
         + 500 * rng.standard_normal(cfg.nf)).astype(np.int16),
        (1500 * rng.standard_normal(cfg.nf)).astype(np.int16),
        (6000 * np.sin(2 * np.pi * 97 * t)).astype(np.int16),
    ]
    pcm = jax.device_put(
        np.stack([contents[s % 4] for s in range(S)]).astype(np.int16)
    )
    state = encoder_init(cfg, S)
    # one real encode to harvest mid-pipeline tensors
    st2, fields = jax.jit(partial(encode_step, cfg, nbytes,
                                  emit_pack=True))(state, pcm)
    jax.block_until_ready(fields)

    def report(name, ms):
        rtf = S * frame_seconds / (ms / 1e3)
        print(f"{name:<18} {ms:8.3f} ms/step   {rtf:>10,.0f}x realtime "
              f"(S={S})", flush=True)

    sel = lambda k: which & {k, "all"}

    if sel("bitmodel") or sel("bitmodel_pack"):
        from lc3jax.dsp.pallas_bitmodel import bitmodel_table_part

        x_q = np.asarray(fields["x_q"], np.int32)
        NT = cfg.ne // 2
        pairs = np.abs(x_q).reshape(S, NT, 2)
        a0, b0 = pairs[:, :, 0], pairs[:, :, 1]
        m = np.maximum(a0, b0)
        g = (m[:, :, None] >= (4 << np.arange(14))[None, None, :]).sum(2)
        a_f, b_f = a0 >> g, b0 >> g
        sym = np.clip(a_f + 4 * b_f, 0, 16)
        lev = np.minimum(g, 3)
        t_pos = np.where(lev <= 1, 1 + (a_f + b_f) * (lev + 1), 12 + lev)
        t1 = np.pad(t_pos[:, :-1], ((0, 0), (1, 0)))
        t2 = np.pad(t_pos[:, :-2], ((0, 0), (2, 0)))
        c = (t2 & 15) * 16 + t1
        lastnz = np.asarray(fields["quant_lastnz_trunc"], np.int32)
        args = tuple(jax.device_put(jnp.asarray(v, jnp.int32))
                     for v in (c, g, sym))
        lz = jax.device_put(jnp.asarray(lastnz))

        lane_sweep = [None]
        if "lanes" in which:
            lane_sweep = [256, 512, 1024]
        for ln in lane_sweep:
            if sel("bitmodel"):
                f = jax.jit(lambda cc, gg, ss, lzz: bitmodel_table_part(
                    cc, gg, ss, 512, cfg.ne, lastnz=lzz, lanes=ln))
                ms = device_step_ms(
                    lambda carry, *a: (carry, f(*a)), 0, (*args, lz), steps=8)
                report(f"bitmodel[{ln}]", ms)
            if sel("bitmodel_pack"):
                f = jax.jit(lambda cc, gg, ss, lzz: bitmodel_table_part(
                    cc, gg, ss, 512, cfg.ne, emit_pack=True, lastnz=lzz,
                    lanes=ln))
                ms = device_step_ms(
                    lambda carry, *a: (carry, f(*a)), 0, (*args, lz), steps=8)
                report(f"bitmodel_pack[{ln}]", ms)

    if sel("pack"):
        from lc3jax.coding.pallas_pack import device_pack

        fd = {k: v for k, v in fields.items()}
        lane_sweep = [None]
        if "lanes" in which:
            lane_sweep = [512, 1024, 2048]
        for ln in lane_sweep:
            f = jax.jit(lambda ff, _ln=ln: device_pack(cfg, nbytes, ff,
                                                       lanes=_ln))
            ms = device_step_ms(lambda carry, ff: (carry, f(ff)), 0, (fd,),
                                steps=8)
            report(f"pack[{ln}]", ms)

    if sel("sns"):
        from lc3jax.dsp.encoder import encoder_params, sns_analysis

        p = encoder_params(cfg)
        x = jnp.asarray(rng.standard_normal((S, cfg.ne)), jnp.float32) * 100
        e_b = jnp.abs(jnp.asarray(
            rng.standard_normal((S, cfg.nb)), jnp.float32)) * 1e4
        att = jnp.zeros((S,), bool)
        f = jax.jit(lambda xx, ee, aa: sns_analysis(p, xx, ee, aa))
        ms = device_step_ms(lambda carry, *a: (carry, f(*a)), 0,
                            (x, e_b, att), steps=8)
        report("sns_analysis", ms)

    if sel("tns"):
        from lc3jax.dsp.encoder import encoder_params, tns_analysis_batch

        p = encoder_params(cfg)
        x = jnp.asarray(rng.standard_normal((S, cfg.ne)), jnp.float32) * 100
        bw = jnp.full((S,), 4, jnp.int32)
        nn = jnp.zeros((S,), bool)
        f = jax.jit(lambda xx, bb, nq: tns_analysis_batch(
            p, xx, bb, nbytes * 8, nq))
        ms = device_step_ms(lambda carry, *a: (carry, f(*a)), 0,
                            (x, bw, nn), steps=8)
        report("tns_analysis", ms)


if __name__ == "__main__":
    main()
