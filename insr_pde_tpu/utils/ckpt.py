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
import jax.numpy as jnp
import numpy as np

# jitted per-(dtype, shapes) leaf packers: checkpointing fetches ONE
# concatenated array per dtype instead of one device->host copy per leaf
# (each copy is a ~20-30 ms round trip on the tunneled TPU; a fluid model
# has ~16 param leaves saved per timestep)
_PACK_CACHE: Dict[tuple, Any] = {}


def _flatten(tree) -> Dict[str, np.ndarray]:
    paths_leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    keys = [jax.tree_util.keystr(p) for p, _ in paths_leaves]
    leaves = [leaf for _, leaf in paths_leaves]
    out: Dict[str, np.ndarray] = {}
    groups: Dict[str, list] = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array):
            groups.setdefault(str(leaf.dtype), []).append(i)
        else:
            out[keys[i]] = np.asarray(leaf)
    for dt, idxs in groups.items():
        sig = (dt, tuple(tuple(leaves[i].shape) for i in idxs))
        fn = _PACK_CACHE.get(sig)
        if fn is None:
            fn = jax.jit(
                lambda ls: jnp.concatenate([jnp.ravel(l) for l in ls]))
            _PACK_CACHE[sig] = fn
        packed = np.asarray(jax.device_get(fn([leaves[i] for i in idxs])))
        off = 0
        for i in idxs:
            shape = tuple(leaves[i].shape)
            n = int(np.prod(shape)) if shape else 1
            out[keys[i]] = packed[off:off + n].reshape(shape)
            off += n
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
