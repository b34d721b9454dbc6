"""Pallas kernel correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facet_graph_convolution_tpu.ops.pallas_kernels import (
    tree_pool_ignore_zeros,
    weighted_aggregate,
)
from facet_graph_convolution_tpu.ops.pooling import tree_pool


def test_weighted_aggregate_matches_einsum(rng):
    n, k, m, c = 512, 23, 9, 64
    q = jnp.asarray(rng.normal(size=(n, k, m)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, k, c)).astype(np.float32))
    out = weighted_aggregate(q, x, tile=256, interpret=True)
    ref = jnp.einsum("nkm,nkc->nmc", q, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_tree_pool_ignore_zeros_matches(rng):
    n, c = 256, 16
    x = rng.normal(size=(n, c)).astype(np.float32)
    # sprinkle fake (all-zero) nodes
    zero_rows = rng.choice(n, size=40, replace=False)
    x[zero_rows] = 0.0
    xj = jnp.asarray(x)
    out = tree_pool_ignore_zeros(xj, tile=64, interpret=True)
    ref = tree_pool(xj, steps=2, mode="avg_ignore_zeros")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
