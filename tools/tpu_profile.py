#!/usr/bin/env python3
"""Ground-truth device profiling via jax.profiler traces.

Host wall-clock is useless on this container's axon TPU tunnel:
dispatches are buffered asynchronously and jax.block_until_ready returns
without waiting for device execution (see CLAUDE.md). The device-side
trace, however, records real module/op durations from the TPU's own
clock. This tool runs N steps of a chosen path under jax.profiler.trace
and prints per-step module duration plus the op-level breakdown.

Usage: python tools/tpu_profile.py [decode|encode|fused] [n_streams] [steps]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_trace(kind: str, n_streams: int, steps: int, trace_dir: str) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/lc3jax-xla-cache-tpu")
    import functools

    import numpy as np

    from lc3jax.config import FrameDuration, Lc3Config
    from lc3jax.coding import native
    from lc3jax.ref.encoder import Lc3Encoder

    # geometry overrides for edge-of-matrix profiling (defaults: headline)
    fs = int(os.environ.get("LC3JAX_FS", "48000"))
    dur = (FrameDuration.MS7P5 if os.environ.get("LC3JAX_DUR", "10") in
           ("7.5", "7p5") else FrameDuration.MS10)
    cfg = Lc3Config.new(fs, dur)
    nbytes = int(os.environ.get("LC3JAX_NBYTES", "150"))
    enc = Lc3Encoder(1, cfg.n_ms, cfg.fs)
    t = np.arange(cfg.nf) / cfg.fs
    pcm = (8000 * np.sin(2 * np.pi * 220 * t)).astype(np.int16)
    payload = bytes(enc.encode_frame(0, pcm, nbytes))
    batch = np.tile(np.frombuffer(payload, np.uint8), (n_streams, 1))

    if kind in ("decode", "decode_pallas"):
        from lc3jax.dsp.decoder import decode_step, decoder_init

        frames = jax.device_put(native.parse_frames_native(cfg, batch))
        step = jax.jit(
            functools.partial(decode_step, cfg, nbytes * 8,
                              use_pallas=kind == "decode_pallas")
        )
        state = decoder_init(cfg, n_streams)
        st, out = step(state, frames)
        jax.block_until_ready((st, out))
        jax.profiler.start_trace(trace_dir)
        st = state
        for _ in range(steps):
            st, out = step(st, frames)
        jax.block_until_ready((st, out))
    elif kind == "encode":
        from lc3jax.dsp.encoder import encode_step, encoder_init

        pcm_b = jax.device_put(np.tile(pcm, (n_streams, 1)))
        step = jax.jit(functools.partial(encode_step, cfg, nbytes))
        state = encoder_init(cfg, n_streams)
        st, out = step(state, pcm_b)
        jax.block_until_ready((st, out))
        jax.profiler.start_trace(trace_dir)
        st = state
        for _ in range(steps):
            st, out = step(st, pcm_b)
        jax.block_until_ready((st, out))
    elif kind == "fused":
        # NOTE: use the undonated jit (make_decode_bytes_step donates the
        # state arg, and this loop re-runs from the same initial state —
        # re-using a donated buffer errors out the profiler session).
        from lc3jax.coding.device import decode_bytes_step
        from lc3jax.dsp.decoder import decoder_init

        bytes_dev = jax.device_put(batch)
        step = jax.jit(functools.partial(decode_bytes_step, cfg, nbytes))
        state = decoder_init(cfg, n_streams)
        st, out = step(state, bytes_dev)
        jax.block_until_ready((st, out))
        jax.profiler.start_trace(trace_dir)
        st = state
        for _ in range(steps):
            st, out = step(st, bytes_dev)
        jax.block_until_ready((st, out))
    elif kind == "encode_fused":
        import functools as _ft

        from lc3jax.coding.pallas_pack import encode_bytes_step
        from lc3jax.dsp.encoder import encoder_init

        pcm_b = jax.device_put(np.tile(pcm, (n_streams, 1)))
        step = jax.jit(_ft.partial(encode_bytes_step, cfg, nbytes))
        state = encoder_init(cfg, n_streams)
        st, out = step(state, pcm_b)
        jax.block_until_ready((st, out))
        jax.profiler.start_trace(trace_dir)
        st = state
        for _ in range(steps):
            st, out = step(st, pcm_b)
        jax.block_until_ready((st, out))
    elif kind == "encode_stages":
        # per-stage attribution: jit each encoder stage standalone with real
        # intermediates and measure each under its own trace window
        import jax.numpy as jnp

        from lc3jax.dsp import encoder as E

        p = E.encoder_params(cfg)
        state = E.encoder_init(cfg, n_streams)
        pcm_b = jax.device_put(np.tile(pcm, (n_streams, 1)))
        nbits = nbytes * 8

        mdct = jax.jit(lambda st, xs: E.forward_mdct(p, st.time_buf, xs))
        tb, x0, e_b, nn = mdct(state, pcm_b)
        bwd = jax.jit(lambda e: E.bandwidth_detect(p, e))
        bw_ind, nbits_bw = bwd(e_b)
        att = jax.jit(lambda st, xs: E.attack_detect(p, st, xs, nbytes))
        attack, _ = att(state, pcm_b)
        sns = jax.jit(lambda x, e, a: E.sns_analysis(p, x, e, a))
        x1, _sns = sns(x0, e_b, attack)
        tns = jax.jit(lambda x, b, nn: E.tns_analysis_batch(p, x, b, nbits, nn))
        x2, tns_f = tns(x1, bw_ind, nn)
        ltpf = jax.jit(lambda st, xs, nn: E.ltpf_analysis(cfg, st.ltpf, xs, nn, nbits))
        ltpf_f, _ = ltpf(state, pcm_b, nn)
        quant = jax.jit(
            lambda st, x, nt, nl: E.spectral_quantize(p, st, x, nbits, nbits_bw, nt, nl)
        )
        x_q, quant_f, _ = quant(state, x2, tns_f["nbits_tns"], ltpf_f["nbits_ltpf"])
        bitc = jax.jit(lambda xq, nsp: E.bit_consumption(p, xq, nbits, nsp))
        res = jax.jit(
            lambda nsp, ntr, gg, x, xq: E.residual_bits_batch(p, nsp, ntr, gg, x, xq)
        )
        noise = jax.jit(lambda x, xq, b, gg: E.noise_level_batch(p, x, xq, b, gg))

        stages = [
            ("mdct", lambda: mdct(state, pcm_b)),
            ("bandwidth", lambda: bwd(e_b)),
            ("attack", lambda: att(state, pcm_b)),
            ("sns", lambda: sns(x0, e_b, attack)),
            ("tns", lambda: tns(x1, bw_ind, nn)),
            ("ltpf", lambda: ltpf(state, pcm_b, nn)),
            ("quantize(incl 2x bitmodel)", lambda: quant(
                state, x2, tns_f["nbits_tns"], ltpf_f["nbits_ltpf"])),
            ("bit_consumption(single)", lambda: bitc(x_q, quant_f["nbits_spec"])),
            ("residual", lambda: res(quant_f["nbits_spec"], quant_f["nbits_trunc"],
                                     quant_f["gg"], x2, x_q)),
            ("noise_level", lambda: noise(x2, x_q, bw_ind, quant_f["gg"])),
        ]
        only = os.environ.get("LC3JAX_STAGE")
        if only:  # op-level breakdown for a single stage
            stages = [(n, f) for n, f in stages if n.startswith(only)]
        def fence(tree):
            # block_until_ready does not fence execution over the axon
            # relay; a tiny real D2H fetch does (round-4 lesson: an
            # unfenced sweep measured 26x-inflated module durations)
            jax.block_until_ready(tree)
            leaves = jax.tree_util.tree_leaves(tree)
            if leaves:
                np.asarray(jax.device_get(leaves[-1].ravel()[:1]))

        for name, fn in stages:
            fence(fn())  # compile
        jax.profiler.start_trace(trace_dir)
        for name, fn in stages:
            for _ in range(steps):
                out = fn()
            fence(out)  # each stage's events land before the next begins
        time.sleep(2)
        jax.profiler.stop_trace()
        if only:
            analyze(trace_dir, steps, n_streams)
        else:
            analyze_stages(trace_dir, [n for n, _ in stages], steps, n_streams)
        raise SystemExit(0)
    else:
        raise SystemExit(f"unknown kind {kind}")
    time.sleep(2)  # let the trace collector drain
    jax.profiler.stop_trace()


def analyze_stages(trace_dir: str, names: list, steps: int, n_streams: int) -> None:
    """Group device module events in timestamp order into per-stage chunks."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise SystemExit("no trace produced")
    with gzip.open(max(paths, key=os.path.getmtime)) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {
        e["pid"]: e["args"]["name"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pid = next((p for p, n in pids.items() if "TPU" in n), None)
    tids = {
        (e["pid"], e["tid"]): e["args"]["name"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    mod_tid = next(t for (p, t), n in tids.items() if p == dev_pid and n == "XLA Modules")
    mods = sorted(
        (e for e in ev if e.get("ph") == "X" and e["pid"] == dev_pid and e["tid"] == mod_tid),
        key=lambda e: e["ts"],
    )
    # each stage dispatched `steps` times sequentially: chunk jit module
    # events in timestamp order
    jit_mods = [e for e in mods if e["name"].startswith("jit")]
    if len(jit_mods) != steps * len(names):
        print(f"warning: {len(jit_mods)} jit modules, expected {steps * len(names)}"
              f" ({sorted(set(e['name'] for e in mods))[:8]}...)")
    total = 0.0
    print(f"per-stage device time (S={n_streams}, median of {steps}):")
    for i, label in enumerate(names):
        chunk = jit_mods[i * steps : (i + 1) * steps]
        if not chunk:
            break
        d = sorted(e["dur"] for e in chunk)
        med = d[len(d) // 2] / 1e3
        total += med
        print(f"  {med:9.3f} ms  {label}  [{chunk[0]['name'][:40]}]")
    print(f"  {total:9.3f} ms  TOTAL (stage sum)")


def analyze(trace_dir: str, steps: int, n_streams: int) -> None:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise SystemExit("no trace produced")
    with gzip.open(max(paths, key=os.path.getmtime)) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {
        e["pid"]: e["args"]["name"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pid = next((p for p, n in pids.items() if "TPU" in n), None)
    if dev_pid is None:
        raise SystemExit(f"no TPU lane in trace (lanes: {pids})")
    tids = {
        (e["pid"], e["tid"]): e["args"]["name"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    mod_tid = next(t for (p, t), n in tids.items() if p == dev_pid and n == "XLA Modules")
    op_tid = next(t for (p, t), n in tids.items() if p == dev_pid and n == "XLA Ops")

    mods = sorted(
        (e for e in ev if e.get("ph") == "X" and e["pid"] == dev_pid and e["tid"] == mod_tid),
        key=lambda e: e["ts"],
    )
    durs = sorted(e["dur"] for e in mods)
    med = durs[len(durs) // 2] / 1e3
    rtf = n_streams * 10.0 / med  # 10 ms frames
    print(f"modules: {len(mods)} (expected {steps}); median {med:.3f} ms/step "
          f"-> {rtf:,.0f}x realtime @ S={n_streams}")

    agg: dict = collections.defaultdict(lambda: [0, 0])
    for e in ev:
        if e.get("ph") == "X" and e["pid"] == dev_pid and e["tid"] == op_tid:
            name = re.sub(r"\.\d+$", "", e["name"])
            agg[name][0] += e["dur"]
            agg[name][1] += 1
    print("top ops (ms/step, n/step):")
    for name, (d, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:14]:
        print(f"  {d / 1e3 / steps:9.3f} ms  n={n // steps:6d}  {name[:70]}")


def main() -> None:
    kind = sys.argv[1] if len(sys.argv) > 1 else "decode"
    n_streams = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    trace_dir = f"/tmp/lc3jax-trace-{kind}-{n_streams}"
    os.system(f"rm -rf {trace_dir}")
    run_trace(kind, n_streams, steps, trace_dir)
    analyze(trace_dir, steps, n_streams)


if __name__ == "__main__":
    main()
