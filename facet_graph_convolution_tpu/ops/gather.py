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
    # halo-extended array). Padding slots (0) are handled by clamp + mask
    # instead of a prepended zero row: the zero row forces XLA to materialize
    # a full padded copy of g (the gather operand can't be fused), while the
    # validity-mask multiply fuses into the slot-sum reduction.
    (adj_t,) = res
    g_flat = g.reshape(-1, g.shape[-1])
    idx = jnp.maximum(adj_t - 1, 0)
    valid = (adj_t > 0).astype(g_flat.dtype)
    dx = jnp.sum(jnp.take(g_flat, idx, axis=0) * valid[:, :, None], axis=1)
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


@partial(jax.custom_vjp, nondiff_argnums=())
def _gather_lane(x_t, adjT, adjT_t):
    pad = jnp.concatenate([jnp.zeros_like(x_t[:, :1]), x_t], axis=1)
    return jnp.take(pad, adjT, axis=1)


def _gather_lane_fwd(x_t, adjT, adjT_t):
    return _gather_lane(x_t, adjT, adjT_t), (adjT_t,)


def _gather_lane_bwd(res, g):
    # g is [C, K, N]; adjT_t's one-indexed flat slots index k·N + n. Padding
    # slots (0) are clamp+masked rather than gathered from a prepended zero
    # column: padding g to [C, K·N+1] materializes a full extra copy of the
    # cotangent (~45 MB/conv at level 0, measured with tools/op_profile.py),
    # while the mask multiply fuses into the slot-sum reduction.
    (adjT_t,) = res
    c = g.shape[0]
    g_flat = g.reshape(c, -1)
    # adjT_t is [S, N] (node axis minor, like the forward's [K, N] K-list):
    # with node-major [N, S] indices XLA canonicalizes the lane gather to a
    # row-major [N·S, C] output plus reshape/transpose churn (~1.5 ms/step
    # measured with tools/op_profile.py)
    idx = jnp.maximum(adjT_t - 1, 0)
    valid = (adjT_t > 0).astype(g_flat.dtype)
    dx = jnp.take(g_flat, idx, axis=1)                  # [C, S, N]
    dx = jnp.sum(dx * valid[None], axis=1)
    return dx, None, None


_gather_lane.defvjp(_gather_lane_fwd, _gather_lane_bwd)


@partial(jax.custom_vjp, nondiff_argnums=())
def _gather_lane_clamped(x_t, adjT, adjT_t):
    return jnp.take(x_t, jnp.maximum(adjT - 1, 0), axis=1)


def _gather_lane_clamped_fwd(x_t, adjT, adjT_t):
    return _gather_lane_clamped(x_t, adjT, adjT_t), (adjT_t,)


# the backward never touches padding slots (adjT_t lists real edges only),
# so it is shared with the zero-padding forward — and exact for it: the true
# gradient through a clamped padding slot is zero because the consumer's
# output must not depend on that slot's value (the clamped contract below)
_gather_lane_clamped.defvjp(_gather_lane_clamped_fwd, _gather_lane_bwd)


def gather_neighbors_lane(
    x_t: jnp.ndarray,
    adjT: jnp.ndarray,
    adjT_t: jnp.ndarray,
    clamped: bool = False,
) -> jnp.ndarray:
    """Node-minor (lane-axis) neighbour gather: ``x_t`` [C, N] node-minor
    features, ``adjT`` [K, N] one-indexed transposed K-list (0 = padding) →
    [C, K, N], i.e. ``out[c, k, n] = x_t[c, adjT[k, n] - 1]`` with a zero
    column gathered for padding slots.

    Produces the [C, K, N] neighbour tensor the node-minor conv consumes
    DIRECTLY — no [N, K, C] → [C, K, N] transpose after the gather and no
    [C, N] → [N, C] transpose before it (measured −8% per conv fwd+bwd vs
    the row-gather + transpose formulation on a 25k-node graph). The
    backward is the same lane-axis gather over ``adjT_t``
    (:func:`facet_graph_convolution_tpu.graph.convert.lane_tables`), so both
    directions stay scatter-free and layout-copy-free.

    With ``clamped=True`` padding slots gather column ``max(adjT-1, 0)``
    (i.e. node 0's finite features) instead of a prepended zero column —
    skipping the [C, N+1] pad materialization the zero-column form forces.
    ONLY valid when the consumer's output provably never depends on
    padding-slot values (e.g. the node-minor conv, whose ``mult_rows``
    multiply zeroes every padding slot's q in f32 before aggregation); NOT
    safe when padding values could turn into NaN before being masked (e.g.
    the rotation-invariant feature path normalizes gathered vectors).
    """
    if clamped:
        return _gather_lane_clamped(x_t, adjT, adjT_t)
    return _gather_lane(x_t, adjT, adjT_t)


@partial(jax.custom_vjp, nondiff_argnums=())
def _gather_lane_pre(x_t, adjT0, idxT, validT):
    return jnp.take(x_t, adjT0, axis=1)


def _gather_lane_pre_fwd(x_t, adjT0, idxT, validT):
    return _gather_lane_pre(x_t, adjT0, idxT, validT), (idxT, validT)


def _gather_lane_pre_bwd(res, g):
    # identical math to _gather_lane_bwd with the clamp/compare already done
    # host-side (graph.convert.lane_tables_pre): nothing here depends on the
    # raw one-indexed tables, so a per-step bank selection of idxT/validT
    # costs only the takes themselves
    idxT, validT = res
    c = g.shape[0]
    g_flat = g.reshape(c, -1)
    dx = jnp.take(g_flat, idxT, axis=1)                 # [C, S, N]
    dx = jnp.sum(dx * validT.astype(g_flat.dtype)[None], axis=1)
    return dx, None, None, None


_gather_lane_pre.defvjp(_gather_lane_pre_fwd, _gather_lane_pre_bwd)


def gather_neighbors_lane_pre(
    x_t: jnp.ndarray,
    adjT0: jnp.ndarray,
    idxT: jnp.ndarray,
    validT: jnp.ndarray,
    validF: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Lane-axis gather over PRE-DERIVED tables
    (:func:`facet_graph_convolution_tpu.graph.convert.lane_tables_pre`):
    same semantics as :func:`gather_neighbors_lane` but with the clamp /
    validity index math done once host-side, so per-step table selection
    from a stacked patch bank stays take-only (see lane_tables_pre).

    Without ``validF`` this is the ``clamped=True`` contract (padding slots
    gather node 0's finite values — the consumer must provably zero them,
    e.g. via ``mult_rows``); passing ``validF`` multiplies padding slots to
    zero, matching the zero-column form (safe for consumers that normalize
    gathered vectors, e.g. the rotation-invariant feature path)."""
    out = _gather_lane_pre(x_t, adjT0, idxT, validT)
    if validF is not None:
        out = out * validF.astype(out.dtype)[None]
    return out


def make_windowed_lane_gather(geometry):
    """Windowed lane-axis gather for HBM-scale graphs (≈1M+ nodes).

    ``geometry`` is ``WindowedLaneTables.geometry`` (graph/convert.py):
    ``(block, window, bwd_window, num_sources, num_out)`` — static. Returns
    a function ``f(x_t, *wt.arrays) -> [C, K, num_out]`` with the same
    value/grad semantics as :func:`gather_neighbors_lane` ``clamped=True``
    over the equivalent flat tables (padding slots gather finite in-window
    garbage the consumer must zero via ``mult_rows``; multiply the output by
    the ``validF`` pack entry for zero-padding consumers).

    Both directions run as a ``lax.scan`` over node slabs: ``dynamic_slice``
    a source window, flat-gather within it, ``dynamic_update_slice`` into
    the output. At 1.27M nodes this restores ~2.2-2.8 ns/row vs ~11 ns/row
    for the flat gather, whose operand no longer fits the on-chip working
    set (measured on v5e; BASELINE.md round 3). The last slab overlaps its
    predecessor (tables clamp its start to ``N − block``); both compute
    identical values for the overlap columns from the same global tables,
    so the double write is benign in both directions.

    Halo-extended sources (``num_sources > num_out``, the D > 1 sharded
    levels): ``x_t`` is the halo-extended [C, N + H] array, the table pack
    carries 4 extra arrays (WindowedLaneTables tail pack), slots pointing
    at tail columns are masked out of the windowed take and added back
    from a flat take on the small [C, H] tail, and the backward emits the
    full [C, N + H] cotangent (tail part via the flat tailS transpose
    gather) so the halo exchange's autodiff routes boundary cotangents
    home. Tail slots come out EXACT (not clamped-garbage): the pack's mask
    multiply already zeroes in-window garbage for them.
    """
    block, window, bwd_window, num_sources, num_out = map(int, geometry)
    has_tail = num_sources > num_out

    @jax.custom_vjp
    def gather_win(x_t, *tabs):
        c = x_t.shape[0]
        relT = tabs[2]
        k = relT.shape[1]
        out_starts, win_starts = tabs[0], tabs[1]
        # + x_t[0,0]*0: inherit x_t's shard_map varying-axis type (a plain
        # zeros carry is 'unvarying' and scan rejects the mixed carry)
        buf = jnp.zeros((c, k, num_out), x_t.dtype) + x_t[0, 0] * 0
        if has_tail:
            not_tail, tailT = tabs[7], tabs[8]
            tail_pad = jnp.concatenate(
                [jnp.zeros_like(x_t[:, :1]), x_t[:, num_out:]], axis=1)

            def blk(buf, xs):
                os_, ws, r, nt, tt = xs
                win = jax.lax.dynamic_slice(x_t, (0, ws), (c, window))
                g = jnp.take(win, r, axis=1) * nt.astype(x_t.dtype)
                g = g + jnp.take(tail_pad, tt, axis=1)   # [C, K, block]
                return jax.lax.dynamic_update_slice(buf, g, (0, 0, os_)), None

            buf, _ = jax.lax.scan(
                blk, buf, (out_starts, win_starts, relT, not_tail, tailT))
            return buf

        def blk(buf, xs):
            os_, ws, r = xs
            win = jax.lax.dynamic_slice(x_t, (0, ws), (c, window))
            g = jnp.take(win, r, axis=1)                 # [C, K, block]
            return jax.lax.dynamic_update_slice(buf, g, (0, 0, os_)), None

        buf, _ = jax.lax.scan(blk, buf, (out_starts, win_starts, relT))
        return buf

    def _fwd(x_t, *tabs):
        out = gather_win(x_t, *tabs)
        res = (tabs[0], tabs[4], tabs[5], tabs[6])
        if has_tail:
            res = res + (tabs[9], tabs[10])
        return out, res

    def _bwd(res, g):
        out_starts, bwd_starts, relS, validS = res[:4]
        c = g.shape[0]
        k = g.shape[1]
        dx = jnp.zeros((c, num_out), g.dtype) + g[0, 0, 0] * 0

        def blk(dx, xs):
            os_, bs, rs, vs = xs
            gwin = jax.lax.dynamic_slice(g, (0, 0, bs), (c, k, bwd_window))
            gf = gwin.reshape(c, k * bwd_window)
            d = jnp.take(gf, rs, axis=1)                 # [C, S, block]
            d = jnp.sum(d * vs.astype(d.dtype)[None], axis=1)
            return jax.lax.dynamic_update_slice(dx, d, (0, os_)), None

        dx, _ = jax.lax.scan(blk, dx, (out_starts, bwd_starts, relS, validS))
        n_tabs = 11 if has_tail else 7
        if has_tail:
            tailS, tailV = res[4], res[5]
            gf = g.reshape(c, -1)                        # flat k·N + n slots
            dt = jnp.take(gf, tailS, axis=1)             # [C, S, H]
            dt = jnp.sum(dt * tailV.astype(gf.dtype)[None], axis=1)
            dx = jnp.concatenate([dx, dt], axis=1)       # [C, N + H]
        return (dx,) + (None,) * n_tabs

    gather_win.defvjp(_fwd, _bwd)
    return gather_win


def neighbor_counts(adj: jnp.ndarray) -> jnp.ndarray:
    """Non-zero entries per row — the conv's degree normalizer, counting the
    self slot (reference ``tf.count_nonzero(adj, 2)``, model.py:436)."""
    return jnp.count_nonzero(adj, axis=-1)
