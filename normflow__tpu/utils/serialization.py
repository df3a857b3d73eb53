"""Leaf-dict pytree (de)serialization, shared by snapshots and weight blobs.

Pytrees are stored as ``{str(index): ndarray}`` dicts of flattened leaves
and restored against a live template (the standard JAX pattern -- the
structure comes from code, only the data from the file).  Used by
``training/checkpoint.py`` (msgpack snapshot files, reference
_normflowcore.py:221-247) and ``models/core.py``'s portable base64 weight
blobs (reference nn/_core.py:108-118).
"""

from __future__ import annotations

import jax
import numpy as np

__all__ = ["leaves_of", "restore_into"]


def leaves_of(tree) -> dict:
    leaves = jax.tree_util.tree_leaves(tree)
    return {str(i): np.asarray(leaf) for i, leaf in enumerate(leaves)}


def restore_into(tree, leaf_dict):
    """Rebuild ``tree`` with leaf data from ``leaf_dict`` (dtype- and
    shape-checked against the template)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if len(leaves) != len(leaf_dict):
        raise ValueError(
            f"snapshot has {len(leaf_dict)} leaves, template has {len(leaves)}"
            " -- model architecture mismatch")
    new_leaves = [
        np.asarray(leaf_dict[str(i)]).astype(np.asarray(old).dtype).reshape(
            np.asarray(old).shape)
        for i, old in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
