"""Checkpoint / resume (SURVEY.md §5.4): flat-dict npz checkpoints of
params + optimizer state + RNG + step, with exact training-curve
continuation (tested in tests/test_train.py::test_checkpoint_resume_exact).

Format: a single ``.npz`` holding every pytree leaf under a ``/``-joined
key path, plus ``__meta__`` (json: step, epoch, extra).  Restore maps leaves
back onto a structurally-identical template pytree (shape+dtype checked),
so arbitrary optax states round-trip without custom serializers."""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_checkpoint(path: str, tree: Any, step: int = 0, epoch: int = 0,
                    extra: dict | None = None) -> None:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for kp, leaf in leaves:
        arrays[_path_str(kp)] = np.asarray(leaf)
    meta = dict(step=int(step), epoch=int(epoch), extra=extra or {})
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic: never leave a torn checkpoint


def load_checkpoint(path: str, template: Any):
    """Returns (tree shaped like template, meta dict)."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        new_leaves = []
        for kp, leaf in paths_and_leaves:
            key = _path_str(kp)
            if key not in data:
                raise KeyError(f"checkpoint missing leaf {key!r}")
            arr = data[key]
            ref = np.asarray(leaf)
            if arr.shape != ref.shape:
                raise ValueError(
                    f"shape mismatch for {key!r}: {arr.shape} vs {ref.shape}")
            new_leaves.append(arr.astype(ref.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves), meta
