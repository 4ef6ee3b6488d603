"""Checkpoint save/load: orbax for training state, npz for plain params.

Capability parity with the reference's checkpoint story
(train.py:223-230 ModelCheckpoint, model_utils.py:20-68 load paths,
scripts/strip_checkpoint.py): full training-state checkpoints with resume,
weights-only loading, tolerant partial loading, and optimizer-state
stripping.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

import jax


def cast_floating(tree, dtype):
    """Cast every floating leaf of a pytree to dtype (bf16 inference:
    the analogue of the reference's fp16 eval, train.py:321)."""
    import jax.numpy as jnp

    def cast(x):
        x = jnp.asarray(x)
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x

    return jax.tree_util.tree_map(cast, tree)


def save_params(path: str, variables: Dict):
    """Save a variables pytree ({'params', 'batch_stats', ...}) as npz."""
    flat = {}
    for coll, tree in variables.items():
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for key_path, leaf in leaves:
            name = coll + "/" + "/".join(
                getattr(k, "key", str(getattr(k, "idx", k))) for k in key_path
            )
            flat[name] = np.asarray(leaf)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **flat)


def load_params(path: str) -> Dict:
    """Load a variables pytree saved by save_params (or a converted ckpt)."""
    if path.endswith(".ckpt") or path.endswith(".pth"):
        from doubletake_tpu.checkpoints.convert import convert_reference_checkpoint

        return convert_reference_checkpoint(path)
    data = np.load(path)
    out: Dict[str, Any] = {}
    for name in data.files:
        parts = name.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[name]
    return out


def lazy_load_params(variables: Dict, loaded: Dict) -> Dict:
    """Tolerant partial load (model_utils.py:47-63 parity): copy leaves that
    exist in both trees with matching shapes; keep the rest initialized."""
    merged = jax.tree_util.tree_map(lambda x: x, variables)

    def merge(dst, src):
        for k, v in src.items():
            if k not in dst:
                continue
            if isinstance(v, dict) and isinstance(dst[k], dict):
                merge(dst[k], v)
            elif not isinstance(v, dict):
                if np.shape(dst[k]) == np.shape(v):
                    dst[k] = v

    for coll in merged:
        if coll in loaded:
            merge(merged[coll], loaded[coll])
    return merged


def save_train_state(ckpt_dir: str, step: int, state, keep: int = 2):
    """Orbax training-state checkpoint (params + opt state + step)."""
    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
    )
    mngr.save(step, args=ocp.args.StandardSave(state))
    mngr.wait_until_finished()
    mngr.close()


def restore_train_state(ckpt_dir: str, abstract_state, step: Optional[int] = None):
    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    step = step if step is not None else mngr.latest_step()
    if step is None:
        return None, None
    state = mngr.restore(step, args=ocp.args.StandardRestore(abstract_state))
    mngr.close()
    return state, step


def strip_checkpoint(src_npz: str, dst_npz: str):
    """Drop optimizer state, keep model variables (strip_checkpoint.py)."""
    data = np.load(src_npz)
    kept = {n: data[n] for n in data.files
            if n.startswith(("params/", "batch_stats/"))}
    np.savez_compressed(dst_npz, **kept)
