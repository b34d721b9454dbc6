"""Pallas TPU kernels for the facet-conv hot path.

Status and rationale (measured on TPU v5e, 21504-node patch):

- The SpMM-equivalent *gather* (``jnp.take`` rows by adjacency) cannot be
  fused into a Pallas kernel on the current jaxlib: Mosaic rejects dynamic
  gather from VMEM refs (``jnp.take``/``take_along_axis`` fail to lower), and
  ``BlockSpec`` index maps select tile-aligned blocks only. XLA's native
  gather is therefore the gather backend, with the transpose-slot custom VJP
  (:mod:`facet_graph_convolution_tpu.ops.gather`) replacing its scatter
  backward.
- The weighted aggregation ``z[n,m,c] = Σ_k q[n,k,m]·x_nbr[n,k,c]`` runs at
  ~2.1 TFLOP/s f32 under XLA (near VPU speed-of-light); the Pallas kernel
  here exists as an alternative backend with explicit (8·TILE, 128) lane
  tiling — useful as a base for fusing more of the epilogue once Mosaic
  gains dynamic gather.

Kernels:

- :func:`weighted_aggregate` — z = Σ_k q ⊙ x_nbr over node tiles;
- :func:`tree_pool_ignore_zeros` — fused pairwise zero-ignoring mean
  (model.py:792-814) over 2-step sibling groups.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Weighted neighbour aggregation
# ---------------------------------------------------------------------------

def _aggregate_kernel(q_ref, x_ref, out_ref, *, k: int, m: int):
    """One node tile: q [T, K, M], x [T, K, C] → out [T, M, C].

    The K loop is unrolled (K ≈ 23); each iteration is a lane-parallel
    multiply-accumulate over [T, C] with the scalar q column broadcast."""
    q = q_ref[:]                      # [T, K, M]
    x = x_ref[:]                      # [T, K, C]
    acc = jnp.zeros(out_ref.shape, dtype=jnp.float32)
    for kk in range(k):
        xk = x[:, kk, :].astype(jnp.float32)             # [T, C]
        qk = q[:, kk, :].astype(jnp.float32)             # [T, M]
        acc = acc + qk[:, :, None] * xk[:, None, :]      # [T, M, C]
    out_ref[:] = acc


def weighted_aggregate(
    q: jnp.ndarray,                   # [N, K, M]
    x_nbr: jnp.ndarray,               # [N, K, C]
    tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas backend for ``einsum('nkm,nkc->nmc')``. N must be a multiple of
    ``tile`` (bucket padding guarantees this for framework patches)."""
    n, k, m = q.shape
    c = x_nbr.shape[-1]
    assert n % tile == 0, (n, tile)
    grid = (n // tile,)
    kernel = functools.partial(_aggregate_kernel, k=k, m=m)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, m, c), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, k, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, m, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, x_nbr)


# ---------------------------------------------------------------------------
# Zero-ignoring binary-tree pooling (2 steps fused)
# ---------------------------------------------------------------------------

def _pool_iz_kernel(x_ref, out_ref):
    """x [T, 4, C] sibling groups → out [T, C]: two fused rounds of pairwise
    mean where an all-zero sibling is replaced by its partner
    (model.py:792-814)."""
    x = x_ref[:]

    def pair_mean(a, b):
        a_zero = jnp.all(a == 0, axis=-1, keepdims=True)
        b_zero = jnp.all(b == 0, axis=-1, keepdims=True)
        ca = jnp.where(a_zero, b, a)
        cb = jnp.where(b_zero, a, b)
        return (ca + cb) * 0.5

    lvl1a = pair_mean(x[:, 0, :], x[:, 1, :])
    lvl1b = pair_mean(x[:, 2, :], x[:, 3, :])
    out_ref[:] = pair_mean(lvl1a, lvl1b)


def tree_pool_ignore_zeros(
    x: jnp.ndarray, tile: int = 512, interpret: bool = False
) -> jnp.ndarray:
    """Fused 2-step zero-ignoring tree pool: [N, C] → [N/4, C]."""
    n, c = x.shape
    assert n % 4 == 0
    groups = n // 4
    tile = min(tile, groups)
    assert groups % tile == 0, (groups, tile)
    xg = x.reshape(groups, 4, c)
    return pl.pallas_call(
        _pool_iz_kernel,
        out_shape=jax.ShapeDtypeStruct((groups, c), x.dtype),
        grid=(groups // tile,),
        in_specs=[
            pl.BlockSpec((tile, 4, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xg)
