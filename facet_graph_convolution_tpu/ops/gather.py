"""Neighbour gather over the one-indexed K-list adjacency.

The framework's SpMM-equivalent data movement (reference ``get_slices`` /
``get_patches``, model.py:380-405): a zero row is prepended so the 0-padded
adjacency slots gather zeros, making padded contributions vanish in sums.
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_neighbors(x: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbour features: ``x`` [N, C], ``adj`` [N, K] one-indexed
    (0 = padding) → [N, K, C]; slot 0 of ``adj`` is the node itself.

    Equivalent to the reference's zero-row-prepend + ``tf.gather``
    (model.py:383-385) without the batch loop.
    """
    padded = jnp.concatenate([jnp.zeros_like(x[:1]), x], axis=0)
    return jnp.take(padded, adj, axis=0)


def neighbor_counts(adj: jnp.ndarray) -> jnp.ndarray:
    """Non-zero entries per row — the conv's degree normalizer, counting the
    self slot (reference ``tf.count_nonzero(adj, 2)``, model.py:436)."""
    return jnp.count_nonzero(adj, axis=-1)
