"""Codec-state checkpoint/resume.

LC3 is stateful streaming: the complete per-stream resume state is the
decoder's {OLA memory, PLC spectrum/seed/alpha, LTPF histories+coeffs} and
the encoder's {MDCT time buffer, attack scalars, LTPF histories, gain-offset
adaptation} (SURVEY.md section 5 "checkpoint/resume"). Both live in flat
pytrees here, so a checkpoint is just the saved tree; these helpers
serialize to a single .npz and restore onto any device/sharding.

Leaves are stored under their pytree key path (e.g. ``.ola_mem``), not a
positional index, so a checkpoint survives field reordering and fails
loudly (ValueError) on added/removed/renamed fields, shape changes, or
dtype changes rather than silently restoring the wrong leaf.
"""

from __future__ import annotations

import json

import jax
import numpy as np

_FORMAT_VERSION = 2
_META_KEY = "__lc3jax_meta__"


def _path_str(path) -> str:
    return jax.tree_util.keystr(path)


def save_state(path: str, state, config_tag: str = "") -> None:
    """Serialize a codec-state pytree to ``path`` (.npz).

    config_tag: free-form stamp (e.g. "48000/MS10/S=2048/nbytes=150") checked
    on load when the loader passes the same tag.
    """
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {_path_str(p): np.asarray(v) for p, v in leaves}
    if len(arrays) != len(leaves):
        raise ValueError("duplicate key paths in state pytree")
    meta = {"format_version": _FORMAT_VERSION, "config_tag": config_tag}
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_state(path: str, like, config_tag: str = ""):
    """Restore a state saved by save_state; `like` provides the tree
    structure (e.g. a freshly built decoder_init/encoder_init state).

    Raises ValueError on any structural mismatch: missing/extra leaves,
    shape or dtype drift, or a config_tag that differs from the saved one.
    """
    data = np.load(path)
    if _META_KEY not in data:
        raise ValueError(
            f"{path} is not a lc3jax v{_FORMAT_VERSION} checkpoint "
            "(missing metadata; re-save with save_state)"
        )
    meta = json.loads(bytes(data[_META_KEY].tobytes()).decode("utf-8"))
    if config_tag and meta.get("config_tag") and meta["config_tag"] != config_tag:
        raise ValueError(
            f"checkpoint config mismatch: saved {meta['config_tag']!r}, "
            f"expected {config_tag!r}"
        )

    leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    saved_keys = set(data.files) - {_META_KEY}
    want_keys = [_path_str(p) for p, _ in leaves]
    missing = [k for k in want_keys if k not in saved_keys]
    extra = sorted(saved_keys - set(want_keys))
    if missing or extra:
        raise ValueError(
            f"checkpoint field mismatch: missing {missing}, unexpected {extra}"
        )

    restored = []
    for key, (_, ref_leaf) in zip(want_keys, leaves):
        a = data[key]
        want_shape = np.shape(ref_leaf)
        want_dtype = np.asarray(ref_leaf).dtype
        if a.shape != want_shape:
            raise ValueError(
                f"checkpoint leaf {key}: shape {a.shape} != expected {want_shape}"
            )
        if a.dtype != want_dtype:
            raise ValueError(
                f"checkpoint leaf {key}: dtype {a.dtype} != expected {want_dtype}"
            )
        restored.append(a)
    return jax.tree_util.tree_unflatten(treedef, restored)
