"""Checkpoint / resume (SURVEY.md §5: the reference persists nothing but
ImGui window layout; here every piece of state is an array pytree, so
serialization is a first-class utility).

Covers: scenes (instances + materials + textures), analyzer/visual state
for resuming an audio-reactive session mid-stream, and framebuffers.
Format: a single ``.npz`` with a JSON manifest describing the tree
structure (no pickle; loadable anywhere).
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def save_pytree(path, tree):
    """Serialize an arbitrary pytree of arrays/scalars to .npz + manifest."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__manifest__"] = np.frombuffer(
        json.dumps({"treedef": str(treedef), "n": len(leaves)})
        .encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_leaves(path):
    """Load the flat leaves back (order preserved). Re-assembly uses the
    caller's structure: ``restore_like(template, path)``."""
    data = np.load(path)
    manifest = json.loads(bytes(data["__manifest__"]).decode())
    return [jnp.asarray(data[f"leaf_{i}"]) for i in range(manifest["n"])]


def restore_like(template, path):
    """Rebuild a pytree with ``template``'s structure and checkpointed
    leaf values. Shapes must match the template's."""
    leaves = load_leaves(path)
    _, treedef = jax.tree_util.tree_flatten(template)
    t_leaves = treedef.flatten_up_to(template)
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template has "
            f"{len(t_leaves)}")
    return jax.tree_util.tree_unflatten(treedef, leaves)
