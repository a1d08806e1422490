"""Explicit PRNG-key plumbing helpers.

The reference relied on the torch global RNG for every stochastic-rounding
site; under jit we thread keys explicitly and derive per-leaf keys
deterministically from the tree structure.
"""

from __future__ import annotations

import jax


def tree_split(key: jax.Array, tree) -> object:
    """One independent key per leaf of ``tree`` (stable flatten order)."""
    leaves, treedef = jax.tree.flatten(tree)
    keys = list(jax.random.split(key, max(len(leaves), 1)))[: len(leaves)]
    return jax.tree.unflatten(treedef, keys)
