"""Pytree path utilities: the foundation for freezing policies and sharding rules.

The reference freezes modules via ``requires_grad_`` mutations scattered across entry
scripts (e.g. Stage1/train_projection_stage1.py:216-233, Stage2/trainer.py:189-246,
cls_evaluate/train_utils.py:286-308). Here a *trainable mask* is just a pytree of bools with
the same structure as the params, built from path predicates; optimizers consume it via
``optax.multi_transform`` / masked updates, and sharding rules match the same path strings.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp


def path_str(path) -> str:
    """Render a jax key-path as a '/'-joined string, e.g. 'llm/layers_0/attn/q_proj/kernel'."""
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def tree_paths(tree) -> list[str]:
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    return [path_str(path) for path, _ in leaves]


def mask_from_predicate(tree, pred: Callable[[str], bool]):
    """Build a bool pytree: leaf is True iff pred(path) is True."""
    return jax.tree_util.tree_map_with_path(lambda path, _: bool(pred(path_str(path))), tree)


def count_params(tree, mask=None) -> int:
    if mask is None:
        return sum(int(x.size) for x in jax.tree.leaves(tree))
    total = 0
    for (p, x), (_, m) in zip(
        jax.tree_util.tree_leaves_with_path(tree),
        jax.tree_util.tree_leaves_with_path(mask),
    ):
        if m:
            total += int(x.size)
    return total


def merge_trees(base: Mapping[str, Any], *others: Mapping[str, Any]) -> dict:
    """Shallow-merge top-level dict pytrees (e.g. {'vision':..} | {'llm':..})."""
    out = dict(base)
    for o in others:
        out.update(o)
    return out


def zeros_like_tree(tree):
    return jax.tree.map(jnp.zeros_like, tree)
