"""Codec-state checkpoint/resume.

LC3 is stateful streaming: the complete per-stream resume state is the
decoder's {OLA memory, PLC spectrum/seed/alpha, LTPF histories+coeffs} and
the encoder's {MDCT time buffer, attack scalars, LTPF histories, gain-offset
adaptation} (SURVEY.md section 5 "checkpoint/resume"). Both live in flat
pytrees here, so a checkpoint is just the saved tree; these helpers
serialize to a single .npz and restore onto any device/sharding.
"""

from __future__ import annotations

import jax
import numpy as np


def _flatten(state) -> dict:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}, treedef


def save_state(path: str, state) -> None:
    arrays, _ = _flatten(state)
    np.savez_compressed(path, **arrays)


def load_state(path: str, like):
    """Restore a state saved by save_state; `like` provides the tree
    structure (e.g. a freshly built decoder_init/encoder_init state)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    restored = [data[f"leaf_{i}"] for i in range(len(leaves))]
    for a, b in zip(restored, leaves):
        assert a.shape == np.shape(b), f"shape mismatch {a.shape} vs {np.shape(b)}"
    return jax.tree_util.tree_unflatten(treedef, restored)
