"""Checkpoint / resume for inverse-rendering optimization state.

The reference's only persistence is the scene archive (dump_robj/
extract_robj, cpu_obj.c:51-101) — kept byte-compatible in
:mod:`tpuray.sceneio`.  This module adds the native-pytree side (SURVEY.md
§5): save/restore of {scene params + optimizer state + step} so a gradient
descent run can resume exactly.  Plain ``.npz`` with a JSON treedef — no
extra dependencies, works for any pytree of arrays.
"""
from __future__ import annotations

import json
import os
from typing import Any, Tuple

import jax
import numpy as np


def save_pytree(path: str, tree: Any, step: int = 0) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__step__"] = np.asarray(step)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, __treedef__=np.frombuffer(
            json.dumps(str(treedef)).encode(), dtype=np.uint8), **arrays)
    os.replace(tmp, path)  # atomic: no torn checkpoints on interruption


def load_pytree(path: str, like: Any) -> Tuple[Any, int]:
    """Restore a pytree saved by :func:`save_pytree`.

    ``like`` supplies the tree structure; it is validated against the
    treedef stored by :func:`save_pytree` so a mismatched structure fails
    loudly instead of silently assigning leaves to the wrong positions."""
    with np.load(path) as z:
        step = int(z["__step__"])
        leaves, treedef = jax.tree.flatten(like)
        saved_treedef = json.loads(bytes(z["__treedef__"]).decode())
        if saved_treedef != str(treedef):
            raise ValueError(
                f"checkpoint {path!r} was saved with tree structure\n  "
                f"{saved_treedef}\nbut `like` has\n  {treedef}")
        restored = [z[f"leaf_{i}"] for i in range(len(leaves))]
        return jax.tree.unflatten(treedef, restored), step
