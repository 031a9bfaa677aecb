"""One process of a 2-process JAX cluster (spawned by test_multihost.py).

Exercises the multi-host/DCN scale-out path of lc3jax.parallel for real:
`jax.distributed` rendezvous over localhost gRPC (the same mechanism that
carries DCN coordination on multi-slice TPU pods), a global 8-device mesh
assembled from 2 processes x 4 local devices, per-process local IO widened
to global jax.Arrays via `multihost_shard_streams`, and the sharded decode
step running SPMD with zero collectives (SURVEY.md section 2.5).

Usage: python multihost_worker.py <coordinator host:port> <process_id> <out.npz>
"""

import os
import sys

S_GLOBAL = 16
NBYTES = 40


def build_payloads():
    """Deterministic 16-stream payload set — identical on every process."""
    import numpy as np

    from lc3jax.config import FrameDuration
    from lc3jax.ref.encoder import Lc3Encoder

    enc = Lc3Encoder(S_GLOBAL, FrameDuration.MS10, 16000)
    t = np.arange(160) / 16000
    return [
        bytes(
            enc.encode_frame(
                s, (500 * (s + 1) * np.sin(2 * np.pi * (100 + 40 * s) * t)).astype(np.int16), NBYTES
            )
        )
        for s in range(S_GLOBAL)
    ]


def main() -> None:
    # env/sys.path mutations live here (not at module level) so the pytest
    # parent can import this module for NBYTES/build_payloads without
    # inheriting a conflicting --xla_force_host_platform_device_count or a
    # mutated sys.path (ADVICE r3)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    coord, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/lc3jax-xla-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import numpy as np

    from lc3jax.coding.host import parse_frames
    from lc3jax.config import FrameDuration, Lc3Config
    from lc3jax.dsp.decoder import decoder_init
    from lc3jax.parallel import (
        init_multihost,
        make_sharded_decode_step,
        multihost_shard_streams,
        multihost_stream_mesh,
    )

    init_multihost(coord, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4, jax.local_devices()

    cfg = Lc3Config.new(16000, FrameDuration.MS10)
    frames_all = parse_frames(cfg, build_payloads())

    # per-process host IO: this process parses/feeds only its local rows
    s_local = S_GLOBAL // 2
    rows = slice(pid * s_local, (pid + 1) * s_local)
    local_frames = jax.tree_util.tree_map(lambda a: a[rows], frames_all)

    mesh = multihost_stream_mesh()
    frames = multihost_shard_streams(mesh, local_frames)
    state = multihost_shard_streams(mesh, decoder_init(cfg, s_local))

    step = make_sharded_decode_step(cfg, NBYTES * 8, mesh)
    state, pcm = step(state, frames)

    # every process fetches exactly its addressable half of the global PCM;
    # the shards of this 1-D mesh must tile one contiguous row block —
    # assert it, so a device-ordering change fails loudly here instead of
    # as a baffling bit-exactness mismatch in the parent (ADVICE r3)
    shards = sorted(pcm.addressable_shards, key=lambda sh: sh.index[0].start or 0)
    for prev, nxt in zip(shards, shards[1:]):
        stop, start = prev.index[0].stop, nxt.index[0].start or 0
        assert stop == start, (
            f"non-contiguous addressable shards: [..,{stop}) then [{start},..)"
        )
    local = np.concatenate([np.asarray(sh.data) for sh in shards])
    starts = [sh.index[0].start or 0 for sh in shards]
    np.savez(out_path, pid=pid, rows=local, start=min(starts))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
