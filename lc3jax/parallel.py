"""Multi-chip scaling: shard the stream axis over a device mesh.

LC3 has no cross-stream coupling (SURVEY.md section 2.5), so scale-out is
pure data parallelism over ICI: a 1-D mesh over all chips, every batched
tensor sharded on its leading stream axis with jax.sharding.NamedSharding.
XLA inserts no collectives in the math; only host<->device IO moves data.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import Lc3Config
from .dsp.decoder import DecoderState, ParsedFrames, decode_step, decoder_init


def stream_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), axis_names=("streams",))


def shard_streams(mesh: Mesh, tree):
    """Place every array in the pytree sharded on its leading (stream) axis."""

    def place(x):
        spec = P("streams", *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def make_sharded_decode_step(cfg: Lc3Config, nbits: int, mesh: Mesh):
    """Jitted decode step whose inputs/outputs live sharded over the mesh.

    The computation is elementwise in the stream axis, so XLA compiles one
    SPMD program per chip with zero inter-chip collectives; throughput
    scales linearly over ICI-connected chips.
    """

    def step(state: DecoderState, frames: ParsedFrames):
        return decode_step(cfg, nbits, state, frames)

    shardings = NamedSharding(mesh, P("streams"))
    return jax.jit(step, donate_argnums=(0,))


def sharded_decoder_init(cfg: Lc3Config, n_streams: int, mesh: Mesh) -> DecoderState:
    return shard_streams(mesh, decoder_init(cfg, n_streams))
