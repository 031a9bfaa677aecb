"""Multi-host (DCN) scale-out, executed for real with 2 JAX processes.

SURVEY.md section 2.5 names DCN-across-slices as the TPU-native scale-out
axis the reference (single-threaded no_std Rust) never had. `parallel.py`'s
multi-host entry points are exercised here end-to-end: two OS processes
rendezvous through `jax.distributed` on localhost (gRPC — the same control
plane used across DCN on real pods), form one global 8-device mesh from
4 local CPU devices each, feed per-process local stream shards, and run the
sharded decode step SPMD. The concatenated per-process outputs must equal
the plain single-process decode bit-for-bit (the codec math carries no
collectives, so multi-host execution is pure stream-axis widening).
"""

import socket
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np

WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_decode_matches_single_process(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    outs = [tmp_path / f"p{i}.npz" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coord, str(i), str(outs[i])],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            logs.append(out.decode(errors="replace"))
    finally:
        # if one worker dies the other blocks in the jax.distributed
        # rendezvous forever — never leak it past the test (ADVICE r3)
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    # stitch the per-process halves back into the global PCM
    parts = {}
    for path in outs:
        z = np.load(path)
        parts[int(z["start"])] = z["rows"]
    got = np.concatenate([parts[k] for k in sorted(parts)])

    # single-process reference over the identical global batch
    from multihost_worker import NBYTES, build_payloads

    from lc3jax.coding.host import parse_frames
    from lc3jax.config import FrameDuration, Lc3Config
    from lc3jax.dsp.decoder import decode_step, decoder_init

    cfg = Lc3Config.new(16000, FrameDuration.MS10)
    frames = parse_frames(cfg, build_payloads())
    state = decoder_init(cfg, got.shape[0])
    _, pcm = jax.jit(lambda s, f: decode_step(cfg, NBYTES * 8, s, f))(state, frames)

    np.testing.assert_array_equal(got, np.asarray(pcm))
