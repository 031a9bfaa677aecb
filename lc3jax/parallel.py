"""Multi-chip scaling: shard the stream axis over a device mesh.

LC3 has no cross-stream coupling (SURVEY.md section 2.5), so scale-out is
pure data parallelism over ICI: a 1-D mesh over all chips, every batched
tensor sharded on its leading stream axis with jax.sharding.NamedSharding.
XLA inserts no collectives in the math; only host<->device IO moves data.

All jitted entry points pin ``in_shardings``/``out_shardings`` explicitly
(as pytree-prefix shardings — every codec tensor is stream-major, so one
``P("streams")`` covers each argument tree), so a mistakenly replicated
input is resharded instead of silently compiling a replicated program.
The frame-axis scan variants take [T, S, ...] arrays sharded on axis 1.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import Lc3Config
from .dsp.decoder import DecoderState, ParsedFrames, decode_step, decoder_init
from .dsp.encoder import EncoderState, encode_step, encoder_init
from .dsp.streaming import decode_frames, encode_frames


def stream_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), axis_names=("streams",))


def _sharding(mesh: Mesh, axis: int) -> NamedSharding:
    """NamedSharding splitting dimension `axis` across the mesh (used as a
    pytree-prefix for whole argument trees)."""
    return NamedSharding(mesh, P(*([None] * axis), "streams"))


def shard_streams(mesh: Mesh, tree, axis: int = 0):
    """Place every array in the pytree sharded on its stream axis."""
    sh = _sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def make_sharded_decode_step(cfg: Lc3Config, nbits: int, mesh: Mesh):
    """Jitted decode step whose inputs/outputs live sharded over the mesh.

    The computation is elementwise in the stream axis, so XLA compiles one
    SPMD program per chip with zero inter-chip collectives; throughput
    scales linearly over ICI-connected chips.
    """

    def step(state: DecoderState, frames: ParsedFrames):
        return decode_step(cfg, nbits, state, frames)

    s0 = _sharding(mesh, 0)
    return jax.jit(
        step,
        in_shardings=(s0, s0),
        out_shardings=(s0, s0),
        donate_argnums=(0,),
    )


def make_sharded_encode_step(cfg: Lc3Config, nbytes: int, mesh: Mesh):
    """Jitted encode step: int16 PCM [S, nf] -> per-frame field dict,
    everything sharded on the stream axis."""

    def step(state: EncoderState, pcm):
        return encode_step(cfg, nbytes, state, pcm)

    # the field dict mixes [S,...] tensors with rank-0 scalars (nbits_bw),
    # so outputs are left to propagate from the pinned inputs
    s0 = _sharding(mesh, 0)
    return jax.jit(step, in_shardings=(s0, s0), donate_argnums=(0,))


def make_sharded_decode_frames(cfg: Lc3Config, nbits: int, mesh: Mesh):
    """Sharded frame-axis scan: frames [T, S, ...] -> pcm [T, S, nf]."""

    def run(state: DecoderState, frames: ParsedFrames):
        return decode_frames(cfg, nbits, state, frames)

    s0, s1 = _sharding(mesh, 0), _sharding(mesh, 1)
    return jax.jit(
        run,
        in_shardings=(s0, s1),
        out_shardings=(s0, s1),
        donate_argnums=(0,),
    )


def make_sharded_encode_frames(cfg: Lc3Config, nbytes: int, mesh: Mesh):
    """Sharded frame-axis scan: pcm [T, S, nf] -> field dict [T, S, ...]."""

    def run(state: EncoderState, pcm):
        return encode_frames(cfg, nbytes, state, pcm)

    s0, s1 = _sharding(mesh, 0), _sharding(mesh, 1)
    return jax.jit(run, in_shardings=(s0, s1), donate_argnums=(0,))


def make_sharded_decode_bytes_step(cfg: Lc3Config, nbytes: int, mesh: Mesh):
    """Sharded fully fused decode: raw frame bytes [S, nbytes] -> PCM.

    The serving shape for multi-chip: each chip runs the whole bytes->PCM
    program (Pallas range decoder + DSP on TPU; the XLA parser elsewhere)
    on its stream shard — still zero collectives."""
    from .coding.device import decode_bytes_step

    def step(state: DecoderState, payloads):
        return decode_bytes_step(cfg, nbytes, state, payloads)

    s0 = _sharding(mesh, 0)
    return jax.jit(
        step,
        in_shardings=(s0, s0),
        out_shardings=(s0, s0),
        donate_argnums=(0,),
    )


def make_sharded_encode_bytes_step(cfg: Lc3Config, nbytes: int, mesh: Mesh,
                                   interpret: bool = False,
                                   lanes: int | None = None):
    """Sharded fully fused encode: PCM [S, nf] -> frame bytes [S, nbytes].

    The pack stage is the Pallas range-encoder kernel
    (coding/pallas_pack.py), so the step is wrapped in shard_map: each
    device runs the whole kernel on its local [S/n, ...] shard with
    per-shard grid/lane geometry (the supported way to run Pallas under a
    mesh), instead of asking GSPMD to partition an opaque kernel call.
    The local shard must still satisfy the kernel's S % 128 == 0 rule.

    TPU meshes run the Mosaic kernel and the step returns
    (state, payloads). interpret=True runs it through the Pallas
    interpreter so CPU meshes can execute the path for real (multi-device
    evidence in __graft_entry__.dryrun_multichip) and returns
    (state, payloads, fields): the encoder fields must stay live through
    the jit boundary — with the interpreted kernel body inlined as plain
    ops, XLA CPU otherwise duplicates shared float producers into fusions
    with different fma contraction and emits self-inconsistent (corrupt)
    frames; see coding.pallas_pack.encode_bytes_step. Production CPU
    serving still uses host-pipelined packing
    (make_sharded_encode_step + pack on host)."""
    from .coding.pallas_pack import encode_bytes_step

    def step(state: EncoderState, pcm):
        return encode_bytes_step(cfg, nbytes, state, pcm,
                                 interpret=interpret, lanes=lanes)

    spec = P("streams")
    if interpret:
        # the fields dict is not uniformly [S, ...]: pack_tables carries
        # streams on axis 1 ([rows, S]) and three leaves are rank-0 mesh
        # constants (nbits_bw, rate_flag, lpc_weighting) — derive each
        # leaf's spec from its abstract shape at a nominal per-shard size
        import jax.numpy as jnp

        S_nom = 128 * mesh.devices.size
        abs_out = jax.eval_shape(
            step,
            jax.eval_shape(lambda: encoder_init(cfg, S_nom)),
            jax.ShapeDtypeStruct((S_nom, cfg.nf), jnp.int16),
        )

        def leaf_spec(path, leaf):
            # explicit axis rules (not shape-sniffing: a non-stream dim
            # that happens to equal S_nom must not silently mis-shard):
            # quant_pack_tables is the one stream-MINOR leaf ([rows, S]);
            # rank-0 leaves are mesh constants (nbits_bw, rate_flag,
            # lpc_weighting); everything else is stream-major [S, ...].
            name = next((k.key for k in path
                         if isinstance(k, jax.tree_util.DictKey)), None)
            if name == "quant_pack_tables":
                assert leaf.shape[1] == S_nom, leaf.shape
                return P(None, "streams")
            if leaf.ndim == 0:
                return P()  # mesh-constant scalar
            assert leaf.shape[0] == S_nom, (
                f"{name or path}: expected stream-major [S, ...] leaf, "
                f"got {leaf.shape}")
            return P("streams")

        out_specs = jax.tree_util.tree_map_with_path(leaf_spec, abs_out)
    else:
        out_specs = (spec, spec)
    # check_vma=False: the encoder DSP initializes several lax.scan carries
    # with constants (e.g. tns_analysis_batch's zero-lattice state), which
    # the varying-manual-axes checker rejects against the varying outputs;
    # the computation is per-stream elementwise, so replication checking
    # adds nothing here.
    sharded = jax.shard_map(
        step, mesh=mesh, in_specs=(spec, spec), out_specs=out_specs,
        check_vma=False,
    )
    s0 = _sharding(mesh, 0)
    out_shardings = jax.tree.map(
        lambda sp: NamedSharding(mesh, sp), out_specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.jit(
        sharded,
        in_shardings=(s0, s0),
        out_shardings=out_shardings,
        donate_argnums=(0,),
    )


def sharded_decoder_init(cfg: Lc3Config, n_streams: int, mesh: Mesh) -> DecoderState:
    return shard_streams(mesh, decoder_init(cfg, n_streams))


def sharded_encoder_init(cfg: Lc3Config, n_streams: int, mesh: Mesh) -> EncoderState:
    return shard_streams(mesh, encoder_init(cfg, n_streams))


# ----------------------------------------------------------- multi-host/DCN


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Initialize the multi-process JAX runtime for multi-slice scale-out.

    SURVEY.md section 2.5: the codec math needs no collectives, so DCN is
    used purely to widen the stream axis across hosts/slices — each process
    feeds its local chips' stream shard, and the global mesh is 1-D over
    every device of every process. On Cloud TPU pods the arguments are
    auto-detected from the environment; pass them explicitly elsewhere
    (coordinator "host:port", the process count, and this process's index).

    Call once per process, before any other lc3jax/parallel use.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def multihost_stream_mesh() -> Mesh:
    """1-D stream mesh over EVERY device of every initialized process
    (ICI within a slice, DCN across slices — no collectives ride it)."""
    return Mesh(np.array(jax.devices()), axis_names=("streams",))


def multihost_shard_streams(mesh: Mesh, tree, axis: int = 0):
    """Assemble globally-sharded arrays from per-process local data.

    Each process passes the [S_local, ...] slab produced by its own host
    IO; the result is the [S_global, ...] jax.Array addressable by the
    sharded step functions above. Single-process meshes degrade to
    shard_streams.
    """
    if jax.process_count() == 1:
        return shard_streams(mesh, tree, axis)
    sh = _sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        tree,
    )
