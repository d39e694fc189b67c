"""Checkpoint / resume.

TPU-native equivalent of the reference's per-timestep torch.save of all
trainable nets' state dicts + timestep (reference: base/baseModel.py:137-162).
Param pytrees are flattened with their tree paths into a single .npz — no
host-side framework dependency, instant save/load, and the pytree structure is
validated on restore.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out[jax.tree_util.keystr(path)] = np.asarray(jax.device_get(leaf))
    return out


def save_pytree(path: str, tree: Any, metadata: Dict[str, Any] | None = None):
    """Save a pytree of arrays (+ scalar int/float/str metadata) to .npz."""
    payload = _flatten(tree)
    if metadata:
        for k, v in metadata.items():
            payload[f"__meta__{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **payload)


def load_pytree(path: str, like: Any):
    """Restore a pytree saved by save_pytree; `like` provides the structure.

    Returns (tree, metadata_dict).
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    meta = {k[len("__meta__"):]: data[k][()] for k in data.files
            if k.startswith("__meta__")}
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, leaf in paths_and_leaves:
        key = jax.tree_util.keystr(p)
        if key not in data.files:
            raise KeyError(f"checkpoint {path} missing leaf {key}")
        arr = data[key]
        if hasattr(leaf, "shape") and tuple(leaf.shape) != arr.shape:
            raise ValueError(
                f"checkpoint leaf {key} shape {arr.shape} != expected {leaf.shape}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves), meta
