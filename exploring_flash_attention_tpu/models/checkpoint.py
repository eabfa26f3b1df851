"""Checkpoint / resume for the training stack.

The reference has no training and therefore no checkpointing (SURVEY §5
"Checkpoint / resume: none"); a production framework needs it, so this
module provides atomic save/restore of arbitrary (params, opt_state, step)
pytrees:

- the tree is flattened to leaves stored in one ``.npz`` (portable, no
  extra deps) with the treedef structure serialized alongside;
- writes are atomic (temp file + rename) so a preempted save can't corrupt
  the previous checkpoint — the failure-tolerance property multi-host
  training needs;
- ``latest_checkpoint`` + step-numbered files give resume-from-newest;
- sharded arrays are pulled to host (fully replicated form) on save and
  re-sharded by the caller's ``jax.device_put`` / shard_map on restore.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from typing import Any, Optional, Tuple

import jax
import numpy as np

_STEP_RE = re.compile(r"ckpt_(\d+)\.npz$")


def save_checkpoint(ckpt_dir: str, step: int, tree: Any) -> str:
    """Atomically write ``tree`` as ``ckpt_dir/ckpt_{step}.npz``."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    os.makedirs(ckpt_dir, exist_ok=True)
    arrays = {}
    meta = {"step": step, "treedef": str(treedef), "n_leaves": len(leaves)}
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        arrays[f"leaf_{i}"] = arr
        # bf16 round-trips through npz as uint16 views
        if arr.dtype.name == "bfloat16":
            arrays[f"leaf_{i}"] = arr.view(np.uint16)
            meta[f"dtype_{i}"] = "bfloat16"
    path = os.path.join(ckpt_dir, f"ckpt_{step}.npz")
    fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, __meta__=json.dumps(meta), **arrays)
        os.replace(tmp, path)                      # atomic publish
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Path of the highest-step checkpoint in ``ckpt_dir`` (None if empty)."""
    best, best_step = None, -1
    try:
        names = os.listdir(ckpt_dir)
    except FileNotFoundError:
        return None
    for name in names:
        m = _STEP_RE.match(name)
        if m and int(m.group(1)) > best_step:
            best, best_step = name, int(m.group(1))
    return os.path.join(ckpt_dir, best) if best else None


def restore_checkpoint(path: str, tree_like: Any) -> Tuple[Any, int]:
    """Restore ``(tree, step)``; ``tree_like`` supplies the structure (and
    validates leaf count/shapes)."""
    import jax.numpy as jnp

    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
        leaves_like, treedef = jax.tree_util.tree_flatten(tree_like)
        if meta["n_leaves"] != len(leaves_like):
            raise ValueError(
                f"checkpoint has {meta['n_leaves']} leaves, expected "
                f"{len(leaves_like)} — model/optimizer config mismatch"
            )
        leaves = []
        for i, like in enumerate(leaves_like):
            arr = data[f"leaf_{i}"]
            if meta.get(f"dtype_{i}") == "bfloat16":
                arr = arr.view(jnp.bfloat16)
            like_shape = tuple(np.shape(like))
            if tuple(arr.shape) != like_shape:
                raise ValueError(
                    f"leaf {i}: checkpoint shape {arr.shape} != expected "
                    f"{like_shape}"
                )
            leaves.append(jnp.asarray(arr))
        return jax.tree_util.tree_unflatten(treedef, leaves), meta["step"]
