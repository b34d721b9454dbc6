"""Three-level multi-scale facet-graph U-Net.

Architecture of the reference ``get_model_reg_multi_scale`` (model.py:837-946):

    L0: Conv(in→32, M=9) → lrelu → pool(4:1)
    L1: Conv(32→64)      → lrelu → pool(4:1)
    L2: Conv(64→128)     → lrelu → Conv(128→128) → lrelu       [center]
        [multi-scale head: Lin(1024) → lrelu → Lin(3)]
    L1: unpool → Conv(128→64) → concat skip → Conv(128→64) → lrelu
        [multi-scale head: Lin(1024) → lrelu → Lin(3)]
    L0: unpool → Conv(64→32) → concat skip → Conv(64→32) → lrelu
        → Lin(1024) → lrelu → Lin(3)

All convolutions are the translation/rotation-variant default
(model.py:841-842); leaky-ReLU slope 0.1 (model.py:846); coarsening is 2
steps per pooling (4:1 node reduction, model.py:847).

Parameters are a plain pytree (nested dicts) so they shard transparently
under pjit and checkpoint under Orbax.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from facet_graph_convolution_tpu.ops.conv import (
    FacetConvVariant,
    facet_conv,
    facet_conv_nminor,
    init_facet_conv,
    init_linear,
    linear,
    per_conv_variants,
)
from facet_graph_convolution_tpu.ops.normalization import lrelu
from facet_graph_convolution_tpu.ops.pooling import (
    tree_pool,
    tree_pool_nminor,
    tree_unpool,
    tree_unpool_nminor,
)


def init_unet(
    key: jax.Array,
    in_channels: int = 6,
    channels: Sequence[int] = (32, 64, 128),
    num_filters: int = 9,
    fc_channels: int = 1024,
    out_channels: int = 3,
    multi_scale: bool = False,
    std_dev: float = 0.05,
    std_dev_bias: float = 0.01,
    variant: FacetConvVariant = FacetConvVariant.DEFAULT,
) -> Dict:
    """Initialize U-Net parameters (reference init: N(0, 0.05) weights,
    N(0, 0.01) biases, model.py:31-44)."""
    c0, c1, c2 = channels
    keys = iter(jax.random.split(key, 16))
    # rotation invariance applies to the FIRST conv only (reference
    # model.py:858 vs 870-930); translation invariance to every conv
    v_first, v_rest = per_conv_variants(variant)
    kw1 = dict(num_filters=num_filters, std_dev=std_dev,
               std_dev_bias=std_dev_bias, variant=v_first)
    kw = dict(num_filters=num_filters, std_dev=std_dev,
              std_dev_bias=std_dev_bias, variant=v_rest)
    lw = dict(std_dev=std_dev, std_dev_bias=std_dev_bias)
    params = {
        "conv1": init_facet_conv(next(keys), in_channels, c0, **kw1),
        "conv2": init_facet_conv(next(keys), c0, c1, **kw),
        "conv3": init_facet_conv(next(keys), c1, c2, **kw),
        "dconv3": init_facet_conv(next(keys), c2, c2, **kw),
        "upconv2": init_facet_conv(next(keys), c2, c1, **kw),
        "dconv2": init_facet_conv(next(keys), 2 * c1, c1, **kw),
        "upconv1": init_facet_conv(next(keys), c1, c0, **kw),
        "dconv1": init_facet_conv(next(keys), 2 * c0, c0, **kw),
        "fc1": init_linear(next(keys), c0, fc_channels, **lw),
        "out0": init_linear(next(keys), fc_channels, out_channels, **lw),
    }
    if multi_scale:
        params["fc_mid"] = init_linear(next(keys), c1, fc_channels, **lw)
        params["out1"] = init_linear(next(keys), fc_channels, out_channels, **lw)
        params["fc_coarse"] = init_linear(next(keys), c2, fc_channels, **lw)
        params["out2"] = init_linear(next(keys), fc_channels, out_channels, **lw)
    return params


def unet_apply(
    params: Dict,
    x: jnp.ndarray,
    adjs: Sequence[jnp.ndarray],
    coarsening_steps: int = 2,
    multi_scale: bool = False,
    alpha: float = 0.1,
    variant: FacetConvVariant = FacetConvVariant.DEFAULT,
    compute_dtype=None,
    adj_ts: Optional[Sequence[jnp.ndarray]] = None,
    mults: Optional[Sequence[jnp.ndarray]] = None,
    remat: bool = False,
) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Forward pass. ``x`` [N, C]; ``adjs`` = K-list adjacency per level
    (fine→coarse), length 1 or 3. With one level the pyramid collapses to the
    single-scale conv stack (the reference supports this via
    ``coarseningLvlNum=1``, dataClasses.py:148-150, train.py:487-488).

    ``remat=True`` checkpoints each conv: the backward recomputes the
    neighbour gather instead of saving/reloading the [N, K, C] residual —
    trades one extra gather per conv for the residual's HBM round-trip."""
    if adj_ts is None:
        adj_ts = [None] * len(adjs)
    if mults is None:
        mults = [None] * len(adjs)
    tmap = dict(zip([id(a) for a in adjs], zip(adj_ts, mults)))

    v_first, v_rest = per_conv_variants(variant)

    def conv(name, h, a):
        adj_t, mult = tmap.get(id(a), (None, None))
        var = v_first if name == "conv1" else v_rest

        def apply(p, h):
            return facet_conv(
                p, h, a, variant=var, compute_dtype=compute_dtype,
                adj_t=adj_t, mult=mult,
            )

        if remat:
            apply = jax.checkpoint(apply)
        return apply(params[name], h)

    if len(adjs) == 1:
        if multi_scale:
            raise ValueError(
                "multi_scale heads need the 3-level pyramid; got a single "
                "adjacency level (the reference hard-codes 3 levels too, "
                "settings.py:32)"
            )
        h = lrelu(conv("conv1", x, adjs[0]), alpha)
        h = lrelu(linear(params["fc1"], h), alpha)
        return linear(params["out0"], h)

    # --- encoder ---
    h1 = lrelu(conv("conv1", x, adjs[0]), alpha)                 # [N, c0]
    p1 = tree_pool(h1, steps=coarsening_steps, mode="max")
    h2 = lrelu(conv("conv2", p1, adjs[1]), alpha)                # [N/4, c1]
    p2 = tree_pool(h2, steps=coarsening_steps, mode="max")
    h3 = lrelu(conv("conv3", p2, adjs[2]), alpha)                # [N/16, c2]

    # --- center ---
    d3 = lrelu(conv("dconv3", h3, adjs[2]), alpha)

    y_coarse = None
    if multi_scale:
        hc = lrelu(linear(params["fc_coarse"], d3), alpha)
        y_coarse = linear(params["out2"], hc)

    # --- decoder ---
    u2 = tree_unpool(d3, steps=coarsening_steps)
    u2 = conv("upconv2", u2, adjs[1])                            # [N/4, c1]
    d2 = lrelu(conv("dconv2", jnp.concatenate([u2, h2], axis=-1), adjs[1]), alpha)

    y_mid = None
    if multi_scale:
        hm = lrelu(linear(params["fc_mid"], d2), alpha)
        y_mid = linear(params["out1"], hm)

    u1 = tree_unpool(d2, steps=coarsening_steps)
    u1 = conv("upconv1", u1, adjs[0])                            # [N, c0]
    d1 = lrelu(conv("dconv1", jnp.concatenate([u1, h1], axis=-1), adjs[0]), alpha)

    h = lrelu(linear(params["fc1"], d1), alpha)
    y_fine = linear(params["out0"], h)

    if multi_scale:
        return y_fine, y_mid, y_coarse
    return y_fine


def unet_apply_pallas(
    params: Dict,
    x: jnp.ndarray,
    adjs: Sequence[jnp.ndarray],
    adj_ts: Sequence[jnp.ndarray],
    mult_rows: Sequence[jnp.ndarray],
    coarsening_steps: int = 2,
    multi_scale: bool = False,
    alpha: float = 0.1,
    variant: FacetConvVariant = FacetConvVariant.DEFAULT,
    compute_dtype=None,
) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Forward pass with the fused Pallas conv epilogue
    (:func:`facet_graph_convolution_tpu.ops.pallas_conv.facet_conv_pallas`).

    ``adjs`` are slot-major [K, N] neighbour lists, ``adj_ts`` their
    slot-major transpose maps, ``mult_rows`` the [K+1, N, 1] fused
    multiplicity/degree rows (trainer ``_patch_arrays(pallas=True)``).
    """
    from facet_graph_convolution_tpu.ops.pallas_conv import facet_conv_pallas

    if variant not in (FacetConvVariant.DEFAULT,
                       FacetConvVariant.TRANSLATION_INVARIANT):
        raise NotImplementedError(
            "pallas backend: default/translation-invariant only — the "
            "default node-minor path supports rotation invariance"
        )
    ti = variant == FacetConvVariant.TRANSLATION_INVARIANT
    tmap = dict(zip([id(a) for a in adjs], zip(adj_ts, mult_rows)))

    def conv(name, h, a):
        adj_t, rows = tmap[id(a)]
        return facet_conv_pallas(
            params[name], h, a, adj_t, rows,
            translation_invariant=ti, compute_dtype=compute_dtype,
        )

    h1 = lrelu(conv("conv1", x, adjs[0]), alpha)
    if len(adjs) == 1:
        if multi_scale:
            raise ValueError("multi_scale heads need the 3-level pyramid")
        h = h1
        h = lrelu(linear(params["fc1"], h), alpha)
        return linear(params["out0"], h)

    p1 = tree_pool(h1, steps=coarsening_steps, mode="max")
    h2 = lrelu(conv("conv2", p1, adjs[1]), alpha)
    p2 = tree_pool(h2, steps=coarsening_steps, mode="max")
    h3 = lrelu(conv("conv3", p2, adjs[2]), alpha)
    d3 = lrelu(conv("dconv3", h3, adjs[2]), alpha)

    y_coarse = None
    if multi_scale:
        hc = lrelu(linear(params["fc_coarse"], d3), alpha)
        y_coarse = linear(params["out2"], hc)

    u2 = tree_unpool(d3, steps=coarsening_steps)
    u2 = conv("upconv2", u2, adjs[1])
    d2 = lrelu(conv("dconv2", jnp.concatenate([u2, h2], axis=-1), adjs[1]), alpha)

    y_mid = None
    if multi_scale:
        hm = lrelu(linear(params["fc_mid"], d2), alpha)
        y_mid = linear(params["out1"], hm)

    u1 = tree_unpool(d2, steps=coarsening_steps)
    u1 = conv("upconv1", u1, adjs[0])
    d1 = lrelu(conv("dconv1", jnp.concatenate([u1, h1], axis=-1), adjs[0]), alpha)

    h = lrelu(linear(params["fc1"], d1), alpha)
    y_fine = linear(params["out0"], h)

    if multi_scale:
        return y_fine, y_mid, y_coarse
    return y_fine


def unet_apply_nminor(
    params: Dict,
    x: jnp.ndarray,
    adjs: Sequence[jnp.ndarray],
    adj_ts: Sequence[jnp.ndarray],
    mult_rows: Sequence[jnp.ndarray],
    coarsening_steps: int = 2,
    multi_scale: bool = False,
    alpha: float = 0.1,
    variant: FacetConvVariant = FacetConvVariant.DEFAULT,
    compute_dtype=None,
    lane: Union[bool, str] = False,
) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Node-minor forward pass — the TPU fast path.

    Same network as :func:`unet_apply`, but activations stay transposed
    [C, N] end-to-end so XLA keeps the node axis minormost (see
    :func:`facet_graph_convolution_tpu.ops.conv.facet_conv_nminor` for why —
    it removes a third of the step's device time in layout copies).

    ``adjs`` must be self-split neighbour K-lists and ``mult_rows`` the
    per-level fused [K+1, N] multipliers (trainer `_patch_arrays(nminor=…)`).
    With ``lane=True`` they are instead the TRANSPOSED [K, N] K-lists and
    lane slot maps (graph.convert.lane_tables) and the convs gather along
    the lane axis — zero gather-boundary transposes. With ``lane="pre"``
    they are the pre-derived packs from graph.convert.lane_tables_pre
    (``adjs`` = (adjT0, validF) tuples, ``adj_ts`` = (idxT, validT),
    ``mult_rows`` = (rows, gate)) — the form used when tables are selected
    per step from a stacked patch bank.
    Input ``x`` [N, C] and outputs [N, out] keep the public orientation;
    the transposes at the boundary are node-count × small-channel arrays.
    """
    tmap = dict(zip([id(a) for a in adjs], zip(adj_ts, mult_rows)))
    v_first, v_rest = per_conv_variants(variant)

    def conv(name, h_t, a):
        adj_t, rows = tmap[id(a)]
        return facet_conv_nminor(
            params[name], h_t, a, adj_t, rows,
            variant=v_first if name == "conv1" else v_rest,
            compute_dtype=compute_dtype, lane=lane,
        )

    def lin(name, h_t):
        p = params[name]
        return p["w"].T @ h_t + p["b"][:, None]

    x_t = x.T

    if len(adjs) == 1:
        if multi_scale:
            raise ValueError("multi_scale heads need the 3-level pyramid")
        h = lrelu(conv("conv1", x_t, adjs[0]), alpha)
        h = lrelu(lin("fc1", h), alpha)
        return lin("out0", h).T

    # --- encoder ---
    h1 = lrelu(conv("conv1", x_t, adjs[0]), alpha)               # [c0, N]
    p1 = tree_pool_nminor(h1, steps=coarsening_steps, mode="max")
    h2 = lrelu(conv("conv2", p1, adjs[1]), alpha)                # [c1, N/4]
    p2 = tree_pool_nminor(h2, steps=coarsening_steps, mode="max")
    h3 = lrelu(conv("conv3", p2, adjs[2]), alpha)                # [c2, N/16]

    # --- center ---
    d3 = lrelu(conv("dconv3", h3, adjs[2]), alpha)

    y_coarse = None
    if multi_scale:
        hc = lrelu(lin("fc_coarse", d3), alpha)
        y_coarse = lin("out2", hc).T

    # --- decoder ---
    u2 = tree_unpool_nminor(d3, steps=coarsening_steps)
    u2 = conv("upconv2", u2, adjs[1])                            # [c1, N/4]
    d2 = lrelu(conv("dconv2", jnp.concatenate([u2, h2], axis=0), adjs[1]), alpha)

    y_mid = None
    if multi_scale:
        hm = lrelu(lin("fc_mid", d2), alpha)
        y_mid = lin("out1", hm).T

    u1 = tree_unpool_nminor(d2, steps=coarsening_steps)
    u1 = conv("upconv1", u1, adjs[0])                            # [c0, N]
    d1 = lrelu(conv("dconv1", jnp.concatenate([u1, h1], axis=0), adjs[0]), alpha)

    h = lrelu(lin("fc1", d1), alpha)
    y_fine = lin("out0", h).T

    if multi_scale:
        return y_fine, y_mid, y_coarse
    return y_fine
