"""Differentiable-rendering utilities.

The reference has no gradient analog (SURVEY.md §4); differentiability is a
north-star extension.  The ``Scene`` pytree mixes float leaves (geometry,
materials, lights — all differentiable) with int/bool leaves (texture ids,
material flags — structural).  These helpers split/rejoin the two so
``jax.grad`` sees a floats-only pytree.
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from .scene import Scene


def _is_float_leaf(x) -> bool:
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)


def partition(tree) -> Tuple[Any, Any]:
    """Split a pytree into (float_leaves, other_leaves); each side keeps the
    full structure with ``None`` in the other side's positions."""
    diff = jax.tree.map(lambda x: x if _is_float_leaf(x) else None, tree)
    rest = jax.tree.map(lambda x: None if _is_float_leaf(x) else x, tree)
    return diff, rest


def combine(diff, rest):
    """Inverse of :func:`partition`."""
    return jax.tree.map(lambda a, b: a if a is not None else b, diff, rest,
                        is_leaf=lambda x: x is None)


def value_and_scene_grad(fn: Callable[..., jnp.ndarray], scene: Scene,
                         *args, **kw):
    """(value, grad) of ``fn(scene, *args)`` w.r.t. every float leaf of
    ``scene``.  The returned grad pytree has Scene structure with ``None``
    in non-differentiable positions."""
    diff, rest = partition(scene)

    def wrapped(d):
        return fn(combine(d, rest), *args, **kw)

    return jax.value_and_grad(wrapped)(diff)


def l2_image_loss(rendered: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum((rendered - target) ** 2)
