"""Neighbour gather over the one-indexed K-list adjacency.

The framework's SpMM-equivalent data movement (reference ``get_slices`` /
``get_patches``, model.py:380-405): a zero row is prepended so the 0-padded
adjacency slots gather zeros, making padded contributions vanish in sums.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=())
def _gather_t(x, adj, adj_t):
    padded = jnp.concatenate([jnp.zeros_like(x[:1]), x], axis=0)
    return jnp.take(padded, adj, axis=0)


def _gather_t_fwd(x, adj, adj_t):
    return _gather_t(x, adj, adj_t), (adj_t,)


def _gather_t_bwd(res, g):
    # g is [rows(adj), K, C]; adj_t flat slots index rows(adj)*K, and adj_t
    # has one row per SOURCE row of x (which may exceed rows(adj) when x is a
    # halo-extended array)
    (adj_t,) = res
    g_flat = g.reshape(-1, g.shape[-1])
    g_pad = jnp.concatenate([jnp.zeros_like(g_flat[:1]), g_flat], axis=0)
    dx = jnp.sum(jnp.take(g_pad, adj_t, axis=0), axis=1)
    return dx, None, None


_gather_t.defvjp(_gather_t_fwd, _gather_t_bwd)


def gather_neighbors(
    x: jnp.ndarray, adj: jnp.ndarray, adj_t: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Gather neighbour features: ``x`` [N, C], ``adj`` [N, K] one-indexed
    (0 = padding) → [N, K, C]; slot 0 of ``adj`` is the node itself.

    Equivalent to the reference's zero-row-prepend + ``tf.gather``
    (model.py:383-385) without the batch loop.

    When ``adj_t`` (the transpose slot map from
    :func:`facet_graph_convolution_tpu.graph.convert.transpose_adjacency`) is
    given, the backward pass is computed as a gather over transpose slots
    instead of an XLA scatter-add — scatters serialize on TPU.
    """
    if adj_t is not None:
        return _gather_t(x, adj, adj_t)
    padded = jnp.concatenate([jnp.zeros_like(x[:1]), x], axis=0)
    return jnp.take(padded, adj, axis=0)


def neighbor_counts(adj: jnp.ndarray) -> jnp.ndarray:
    """Non-zero entries per row — the conv's degree normalizer, counting the
    self slot (reference ``tf.count_nonzero(adj, 2)``, model.py:436)."""
    return jnp.count_nonzero(adj, axis=-1)
