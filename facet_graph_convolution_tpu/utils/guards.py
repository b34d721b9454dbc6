"""NaN/Inf guards.

The reference scans the network output for NaN after every step and aborts at
the next checkpoint when fully NaN (train.py:505-506,551-555,620-624). Here
the equivalent check is a single device-side reduction over the loss/params.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def has_nonfinite(tree) -> jnp.ndarray:
    """Scalar bool: any non-finite value anywhere in the pytree."""
    leaves = jax.tree_util.tree_leaves(tree)
    flags = [jnp.any(~jnp.isfinite(leaf)) for leaf in leaves if hasattr(leaf, "dtype")
             and jnp.issubdtype(leaf.dtype, jnp.floating)]
    if not flags:
        return jnp.asarray(False)
    return jnp.any(jnp.stack(flags))


def assert_finite_tree(tree, name: str = "tree") -> None:
    """Host-side check (forces a sync); raises on non-finite values."""
    if bool(has_nonfinite(tree)):
        raise FloatingPointError(f"non-finite values detected in {name}")
