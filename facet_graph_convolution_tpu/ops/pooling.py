"""Binary-tree pooling / unpooling over coarsening-ordered node axes.

Because the Graclus permutation places the 2^steps descendants of each coarse
node at consecutive indices (graph/coarsen.py), pooling is a reshape+reduce —
exactly the TPU-friendly structure the reference exploits
(``custom_binary_tree_pooling``, model.py:779-815;
``custom_upsampling``, model.py:817-825).
"""

from __future__ import annotations

import jax.numpy as jnp


def tree_pool(x: jnp.ndarray, steps: int = 1, mode: str = "max") -> jnp.ndarray:
    """Pool sibling groups of size 2^steps along the node axis.

    ``x`` [N, C] → [N / 2^steps, C].

    - ``max`` / ``avg``: plain reduction (model.py:786-791);
    - ``avg_ignore_zeros``: iterated pairwise mean where an all-zero sibling
      (a fake node) is replaced by its partner's value before averaging, so
      fake nodes don't drag means toward zero (model.py:792-814).
    """
    n, c = x.shape
    group = 2 ** steps
    if mode == "max":
        return jnp.max(x.reshape(-1, group, c), axis=1)
    if mode == "avg":
        return jnp.mean(x.reshape(-1, group, c), axis=1)
    if mode == "avg_ignore_zeros":
        px = x
        for _ in range(steps):
            pair = px.reshape(-1, 2, px.shape[-1])
            a, b = pair[:, 0, :], pair[:, 1, :]
            a_zero = jnp.all(a == 0, axis=-1, keepdims=True)
            b_zero = jnp.all(b == 0, axis=-1, keepdims=True)
            ca = jnp.where(a_zero, b, a)
            cb = jnp.where(b_zero, a, b)
            px = (ca + cb) / 2.0
        return px
    raise ValueError(f"unknown pool mode {mode!r}")


def tree_unpool(x: jnp.ndarray, steps: int = 1) -> jnp.ndarray:
    """Tile each coarse node over its 2^steps descendants (reference
    ``custom_upsampling``, model.py:817-825). [N, C] → [N·2^steps, C]."""
    group = 2 ** steps
    return jnp.repeat(x, group, axis=0)


def tree_pool_nminor(x_t: jnp.ndarray, steps: int = 1, mode: str = "max") -> jnp.ndarray:
    """Node-minor :func:`tree_pool`: ``x_t`` [C, N] → [C, N / 2^steps]."""
    c, n = x_t.shape
    group = 2 ** steps
    if mode == "max":
        return jnp.max(x_t.reshape(c, -1, group), axis=-1)
    if mode == "avg":
        return jnp.mean(x_t.reshape(c, -1, group), axis=-1)
    if mode == "avg_ignore_zeros":
        px = x_t
        for _ in range(steps):
            pair = px.reshape(c, -1, 2)
            a, b = pair[..., 0], pair[..., 1]
            a_zero = jnp.all(a == 0, axis=0, keepdims=True)
            b_zero = jnp.all(b == 0, axis=0, keepdims=True)
            ca = jnp.where(a_zero, b, a)
            cb = jnp.where(b_zero, a, b)
            px = (ca + cb) / 2.0
        return px
    raise ValueError(f"unknown node-minor pool mode {mode!r}")


def tree_unpool_nminor(x_t: jnp.ndarray, steps: int = 1) -> jnp.ndarray:
    """Node-minor :func:`tree_unpool`: [C, N] → [C, N·2^steps]."""
    return jnp.repeat(x_t, 2 ** steps, axis=-1)
