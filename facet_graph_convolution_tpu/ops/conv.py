"""Facet graph convolution (FeaStNet-style soft-assignment conv).

The hot op of the framework. Semantics of the reference ``custom_conv2d``
(model.py:427-504):

    y_i = bias + (1/|N(i)|) Σ_{j∈N(i)} Σ_m q_ijm · (W_m x_j)

with per-edge soft assignment over M filters

    q_ij: = softmax_M(u·x_i + v·x_j + c)            (default, model.py:74-95)
    q_ij: = softmax_M(u·(x_i − x_j) + c)            (translation-invariant,
                                                     model.py:97-124)
    q_ij: = softmax_M(u·R_i·x_j + c)                (rotation-invariant,
                                                     model.py:186-377)

|N(i)| counts the node's non-zero adjacency slots (self included), and the
bias is only added where |N(i)| > 0 (model.py:436-443,496-500).

TPU-first factorization: since W_m is linear,
``Σ_j q_ijm (W_m x_j) = W_m (Σ_j q_ijm x_j)`` — we aggregate neighbours in
input space (gather [N,K,C] + [N,K,M]) and run one batched matmul on the MXU,
instead of gathering the [N,K,M·out] tensor the reference materializes. The
direct formulation is kept as :func:`facet_conv_gather` for oracle testing.
"""

from __future__ import annotations

import enum
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from facet_graph_convolution_tpu.ops.gather import (
    gather_neighbors,
    gather_neighbors_lane,
    gather_neighbors_lane_pre,
    neighbor_counts,
)


class FacetConvVariant(str, enum.Enum):
    DEFAULT = "default"
    TRANSLATION_INVARIANT = "translation_invariant"
    ROTATION_INVARIANT = "rotation_invariant"


# ---------------------------------------------------------------------------
# Parameter initialization (reference variable factories, model.py:31-44:
# weights/assignments ~ N(0, 0.05), biases ~ N(0, 0.01)).
# ---------------------------------------------------------------------------

def init_facet_conv(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    num_filters: int,
    variant: FacetConvVariant = FacetConvVariant.DEFAULT,
    std_dev: float = 0.05,
    std_dev_bias: float = 0.01,
) -> Dict[str, jnp.ndarray]:
    kw, kb, ku, kv, kc = jax.random.split(key, 5)
    params = {
        "w": jax.random.normal(kw, (num_filters, out_channels, in_channels)) * std_dev,
        "b": jax.random.normal(kb, (out_channels,)) * std_dev_bias,
        "u": jax.random.normal(ku, (num_filters, in_channels)) * std_dev,
        "c": jax.random.normal(kc, (num_filters,)) * std_dev,
    }
    if variant == FacetConvVariant.DEFAULT:
        params["v"] = jax.random.normal(kv, (num_filters, in_channels)) * std_dev
    return params


def init_linear(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    std_dev: float = 0.05,
    std_dev_bias: float = 0.01,
) -> Dict[str, jnp.ndarray]:
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (in_channels, out_channels)) * std_dev,
        "b": jax.random.normal(kb, (out_channels,)) * std_dev_bias,
    }


def linear(params: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """Per-node dense layer (reference ``custom_lin``, model.py:763-769)."""
    return x @ params["w"] + params["b"]


# ---------------------------------------------------------------------------
# Assignment weights
# ---------------------------------------------------------------------------

def rotation_to_axis(normals: jnp.ndarray) -> jnp.ndarray:
    """Per-face rotation matrix aligning each normal with +z via the Rodrigues
    formula (reference ``getRotationToAxis``, model.py:128-183).

    Implements the *intended* math: the reference computes a scalar global
    ``tf.norm`` for sin (missing ``axis=-1``, model.py:144) on a path that is
    dead by default; here ``sin²`` is per-face.
    """
    ref = jnp.array([0.0, 0.0, 1.0], dtype=normals.dtype)
    cross = jnp.cross(normals, jnp.broadcast_to(ref, normals.shape))
    sin2 = jnp.sum(cross * cross, axis=-1)                     # |n × z|²
    cos = normals[..., 2]
    # skew-symmetric matrix of the rotation axis
    zeros = jnp.zeros_like(cos)
    ssm = jnp.stack(
        [
            jnp.stack([zeros, -cross[..., 2], cross[..., 1]], axis=-1),
            jnp.stack([cross[..., 2], zeros, -cross[..., 0]], axis=-1),
            jnp.stack([-cross[..., 1], cross[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.eye(3, dtype=normals.dtype)
    # R = I + S + S²·(1−cos)/sin²; guard the antiparallel/parallel limit
    coef = jnp.where(sin2 > 1e-12, (1.0 - cos) / jnp.maximum(sin2, 1e-12), 0.0)
    return eye + ssm + ssm @ ssm * coef[..., None, None]


def assignment_weights(
    params: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    adj: jnp.ndarray,
    variant: FacetConvVariant = FacetConvVariant.DEFAULT,
    split_channels: Optional[int] = None,
    adj_t: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-edge soft assignment q [N, K, M] = softmax over M of the variant's
    logits. Padded adjacency slots receive logits as if x_j = 0, matching the
    reference's zero-row gather (model.py:383-385)."""
    u, c = params["u"], params["c"]
    if variant == FacetConvVariant.DEFAULT:
        ux = x @ u.T                                           # [N, M]
        vx = x @ params["v"].T                                 # [N, M]
        vx_nbr = gather_neighbors(vx, adj, adj_t)              # [N, K, M]
        logits = ux[:, None, :] + vx_nbr + c
    elif variant == FacetConvVariant.TRANSLATION_INVARIANT:
        ux = x @ u.T
        ux_nbr = gather_neighbors(ux, adj, adj_t)
        logits = ux[:, None, :] - ux_nbr + c                   # u·(x_i − x_j)
    elif variant == FacetConvVariant.ROTATION_INVARIANT:
        logits = _rotation_invariant_logits(u, c, x, adj)
    else:
        raise ValueError(variant)
    return jax.nn.softmax(logits, axis=-1)


def per_conv_variants(variant: FacetConvVariant) -> Tuple[FacetConvVariant, FacetConvVariant]:
    """(first conv's variant, remaining convs' variant) — reference
    semantics: ``bRotInvariant`` reaches ONLY the first conv
    (``rotation_invariance=bRotInvariant`` at model.py:858; every other conv
    passes ``rotation_invariance=False``, model.py:870-930), while
    ``bTransInvariant`` reaches every conv."""
    rest = (variant if variant == FacetConvVariant.TRANSLATION_INVARIANT
            else FacetConvVariant.DEFAULT)
    return variant, rest


def _rotation_invariant_feats(x, x_nbr, self_slot: bool) -> jnp.ndarray:
    """Rotation-invariant assignment features from PRE-GATHERED neighbours
    ``x_nbr`` [N, K, C]. Channel layouts follow the reference
    (model.py:452-460): 3 = normals; 4 = normals + area (neighbour area
    ratio, model.py:282-288); 6 = normals + position (relative, rotated,
    model.py:310-377).

    ``self_slot=True`` prepends the analytic self slot (used on self-split
    graphs where the self entry is removed from the K-list): the rotation
    aligns the node's own normal with +z exactly, so the self features are
    ``[0, 0, 1]`` normals, area ratio 1, and relative position 0 — no gather
    needed."""
    in_ch = x.shape[-1]
    normals = x[:, :3]
    rot = rotation_to_axis(normals)                            # [N, 3, 3]
    n_nbr = x_nbr[..., :3]
    n_rot = jnp.einsum("nij,nkj->nki", rot, n_nbr)
    if in_ch == 3:
        feats = n_rot
        self_feats = jnp.array([0.0, 0.0, 1.0], dtype=x.dtype)
    elif in_ch == 4:
        # guard the ratio for fake (zero-area) centre nodes: the reference
        # divides raw (model.py:286, dead path) which yields NaN that
        # normalize_tensor's global mean would smear over every node
        center_area = x[:, None, 3:]
        safe = jnp.where(jnp.abs(center_area) > 1e-12, center_area, 1.0)
        area_ratio = jnp.where(
            jnp.abs(center_area) > 1e-12, x_nbr[..., 3:] / safe, 0.0
        )
        feats = jnp.concatenate([n_rot, area_ratio], axis=-1)
        self_feats = jnp.array([0.0, 0.0, 1.0, 1.0], dtype=x.dtype)
    elif in_ch == 6:
        rel = x_nbr[..., 3:] - x[:, None, 3:]
        p_rot = jnp.einsum("nij,nkj->nki", rot, rel)
        feats = jnp.concatenate([n_rot, p_rot], axis=-1)
        self_feats = jnp.array([0, 0, 1, 0, 0, 0], dtype=x.dtype)
    else:
        raise ValueError(f"rotation-invariant assignment needs 3/4/6 channels, got {in_ch}")
    if self_slot:
        self_row = jnp.broadcast_to(self_feats, (x.shape[0], 1, in_ch))
        feats = jnp.concatenate([self_row, feats], axis=1)
    return feats


def _rotation_invariant_logits(u, c, x, adj) -> jnp.ndarray:
    x_nbr = gather_neighbors(x, adj)                           # [N, K, C]
    feats = _rotation_invariant_feats(x, x_nbr, self_slot=False)
    return jnp.einsum("nkc,mc->nkm", feats, u) + c


# ---------------------------------------------------------------------------
# Convolution
# ---------------------------------------------------------------------------

def _finish_conv(q, x, adj, w, b, bias_mask: bool, compute_dtype=None,
                 adj_t=None, mult=None):
    """Aggregate-then-transform epilogue shared by all variants. ``mult``
    carries deduped-adjacency slot multiplicities (see
    :func:`facet_graph_convolution_tpu.graph.convert.dedupe_klist`)."""
    dtype = compute_dtype or x.dtype
    if mult is not None:
        q = q * mult[:, :, None]
        deg = jnp.sum(mult, axis=-1)
    else:
        deg = neighbor_counts(adj)
    inv_deg = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1), 0.0).astype(dtype)

    x_nbr = gather_neighbors(x.astype(dtype), adj, adj_t)      # [N, K, C]
    # bf16 inputs with f32 accumulation (MXU-native) when compute_dtype is set
    z = jnp.einsum(
        "nkm,nkc->nmc", q.astype(dtype), x_nbr,
        preferred_element_type=jnp.float32,
    )
    z = (z * inv_deg[:, None, None]).astype(dtype)
    y = jnp.einsum(
        "nmc,moc->no", z, w.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    y = y.astype(jnp.float32)
    if bias_mask:
        y = jnp.where((deg > 0)[:, None], y + b, y)
    else:
        y = y + b
    return y


def facet_conv(
    params: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    adj: jnp.ndarray,
    variant: FacetConvVariant = FacetConvVariant.DEFAULT,
    bias_mask: bool = True,
    compute_dtype=None,
    adj_t: Optional[jnp.ndarray] = None,
    mult: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Facet graph convolution, fast path.

    ``x`` [N, C], ``adj`` [N, K] one-indexed → [N, out]. Matches
    ``custom_conv2d`` (model.py:427-504) to float tolerance. ``adj_t``
    enables the scatter-free gather backward.

    For the default and translation-invariant assignments, the assignment
    projection and the feature gather share ONE combined [N, K, C+M] gather
    (the projection commutes with the gather), halving gather count and index
    processing versus two separate gathers.
    """
    if variant in (FacetConvVariant.DEFAULT, FacetConvVariant.TRANSLATION_INVARIANT):
        return _facet_conv_fused(params, x, adj, variant, bias_mask,
                                 compute_dtype, adj_t, mult)

    # rotation-invariant: the assignment depends on gathered + rotated
    # neighbour features (no projection commutes with the gather), so gather
    # x once and reuse it for both assignment and aggregation. Self-split
    # graphs get the analytic self slot (no gather).
    self_mult = None
    if isinstance(mult, (tuple, list)):
        mult, self_mult = mult
    dtype = compute_dtype or x.dtype
    x_nbr = gather_neighbors(x, adj, adj_t)                    # [N, K, C]
    feats = _rotation_invariant_feats(
        x, x_nbr, self_slot=self_mult is not None
    )
    logits = jnp.einsum("nkc,mc->nkm", feats, params["u"]) + params["c"]
    q = jax.nn.softmax(logits, axis=-1)
    if self_mult is not None:
        x_nbr = jnp.concatenate([x[:, None, :], x_nbr], axis=1)
        mult = jnp.concatenate([self_mult[:, None], mult], axis=1)
    if mult is not None:
        q = q * mult[:, :, None]
        deg = jnp.sum(mult, axis=-1)
    else:
        deg = neighbor_counts(adj)
    inv_deg = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1), 0.0).astype(dtype)
    z = jnp.einsum("nkm,nkc->nmc", q.astype(dtype), x_nbr.astype(dtype),
                   preferred_element_type=jnp.float32)
    z = (z * inv_deg[:, None, None]).astype(dtype)
    y = jnp.einsum("nmc,moc->no", z, params["w"].astype(dtype),
                   preferred_element_type=jnp.float32).astype(jnp.float32)
    if bias_mask:
        return jnp.where((deg > 0)[:, None], y + params["b"], y)
    return y + params["b"]


def _facet_conv_fused(params, x, adj, variant, bias_mask, compute_dtype, adj_t,
                      mult=None):
    u, c, w, b = params["u"], params["c"], params["w"], params["b"]
    dtype = compute_dtype or x.dtype
    n, in_ch = x.shape

    # self-split graphs (graph.convert.split_self_klist) carry the self slot's
    # multiplicity separately: adj then lists neighbours only and the self
    # contribution is computed locally, without a gather
    self_mult = None
    if isinstance(mult, (tuple, list)):
        mult, self_mult = mult

    # translation invariance uses v = −u (u·(x_i − x_j) = u·x_i + (−u)·x_j)
    proj = params["v"] if variant == FacetConvVariant.DEFAULT else -u
    vx = x @ proj.T                                            # [N, M]
    cat = jnp.concatenate([x.astype(dtype), vx.astype(dtype)], axis=-1)
    cat_nbr = gather_neighbors(cat, adj, adj_t)                # [N, K, C+M]
    if self_mult is not None:
        # self-split adjacency: the self slot's features are the local row —
        # prepend it instead of gathering it (one fewer gather row per node,
        # identical downstream pipeline)
        cat_nbr = jnp.concatenate([cat[:, None, :], cat_nbr], axis=1)
        mult = jnp.concatenate([self_mult[:, None], mult], axis=1)
    x_nbr = cat_nbr[..., :in_ch]
    vx_nbr = cat_nbr[..., in_ch:]

    ux = x @ u.T                                               # [N, M]
    logits = ux[:, None, :].astype(dtype) + vx_nbr + c.astype(dtype)
    q = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    if mult is not None:
        # deduped adjacency: q weighted by slot multiplicity; padding slots
        # have mult 0 (their q would otherwise be spurious — in the raw
        # K-list the zero-row gather handles this through x_nbr = 0 alone)
        q = q * mult[:, :, None]
        deg = jnp.sum(mult, axis=-1)
    else:
        deg = neighbor_counts(adj)
    q = q.astype(dtype)
    inv_deg = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1), 0.0)
    z = jnp.einsum("nkm,nkc->nmc", q, x_nbr,
                   preferred_element_type=jnp.float32)
    z = (z * inv_deg[:, None, None]).astype(dtype)
    y = jnp.einsum("nmc,moc->no", z, w.astype(dtype),
                   preferred_element_type=jnp.float32).astype(jnp.float32)
    if bias_mask:
        y = jnp.where((deg > 0)[:, None], y + b, y)
    else:
        y = y + b
    return y


def _aggregate_nminor(q_t: jnp.ndarray, x_nbr_t: jnp.ndarray) -> jnp.ndarray:
    """K-slot aggregation ``z[m,c,n] = Σ_k q[m,k,n]·x[c,k,n]`` as an explicit
    broadcast-multiply-reduce instead of ``einsum``/``dot_general``.

    XLA lowers the n-batched tiny-matrix dot (M×K times K×C per node) by
    canonicalizing operand/result layouts, inserting ~0.4-0.9 ms layout
    copies per conv around the dot in BOTH directions (measured,
    tools/op_profile.py); the same contraction written as multiply +
    f32-accumulated reduce stays a VPU reduce fusion in the operands' native
    node-minor layouts — and its autodiff backward (broadcast-mul-reduce over
    c and m) inherits the same fusion-friendly form.

    Numerics note: under ``compute_dtype=bfloat16`` the per-slot PRODUCTS
    round to bf16 before the f32-accumulated sum, whereas the dot_general
    form (``preferred_element_type=f32``) kept exact bf16×bf16 products.
    Computing the products in f32 here measures 13% slower end-to-end
    (73.1M vs 84.3M edges/s — the f32 operand planes double the reduce
    fusion's VPU traffic), so the bf16 rounding is accepted as part of the
    bf16 compute policy; the nminor-vs-row-path parity tests bound the
    effect, and ``compute_dtype=None`` gives the all-f32 path."""
    prod = q_t[:, None, :, :] * x_nbr_t[None, :, :, :]          # [M, C, K, N]
    return jnp.sum(prod, axis=2, dtype=jnp.float32)


def facet_conv_nminor(
    params: Dict[str, jnp.ndarray],
    x_t: jnp.ndarray,
    adj: jnp.ndarray,
    adj_t: jnp.ndarray,
    mult_rows: jnp.ndarray,
    variant: FacetConvVariant = FacetConvVariant.DEFAULT,
    compute_dtype=None,
    lane: bool = False,
) -> jnp.ndarray:
    """Node-minor (transposed) facet conv: ``x_t`` [C, N] → [out, N].

    Same math as :func:`facet_conv` on a self-split deduped graph, laid out
    for the TPU: XLA's VPU reductions want the node axis minormost (it
    otherwise inserts layout-copies of every [N,K,C] intermediate — measured
    ~7 ms/step, a third of the training step). Keeping activations [C, N]
    end-to-end confines row-major to the gather itself: one small transpose
    of ``cat`` before the gather and one big transpose of its output.

    With ``lane=True`` even those transposes go away: the gather runs along
    the lane (node) axis via :func:`gather_neighbors_lane`, producing the
    [C, K, N] neighbour tensor directly. ``adj`` is then the TRANSPOSED
    K-list [K, N] and ``adj_t`` the lane slot map, both from
    :func:`facet_graph_convolution_tpu.graph.convert.lane_tables`.

    ``mult_rows`` [K+1, N] is the static fused per-slot multiplier from
    :func:`facet_graph_convolution_tpu.graph.convert.fused_mult_rows`
    (slot 0 = self): multiplicity × 1/deg, 0 on padding. ``adj`` [N, K]
    lists neighbours only (self split out), ``adj_t`` its transpose map.

    With ``lane="pre"`` the tables are the PRE-DERIVED pack from
    :func:`facet_graph_convolution_tpu.graph.convert.lane_tables_pre`:
    ``adj`` = (adjT0, validF), ``adj_t`` = (idxT, validT), and ``mult_rows``
    = (rows, gate) with ``gate`` the precomputed [N] real-node mask — the
    form used when tables are selected per step from a stacked patch bank
    (DP / scanned multi-patch training), keeping the scan body take-only.
    """
    if variant == FacetConvVariant.ROTATION_INVARIANT:
        return _facet_conv_nminor_rotinv(params, x_t, adj, adj_t, mult_rows,
                                         compute_dtype, lane)
    gate = None
    if lane == "pre":
        adj, _ = adj                     # validF unused: mult_rows zeroes q
        mult_rows, gate = mult_rows
    u, c, w, b = params["u"], params["c"], params["w"], params["b"]
    dtype = compute_dtype or x_t.dtype
    in_ch, n = x_t.shape
    m, out_ch, _ = w.shape

    proj = params["v"] if variant == FacetConvVariant.DEFAULT else -u
    vx_t = proj @ x_t                                          # [M, N]
    ux_t = u @ x_t                                             # [M, N]
    cat_t = jnp.concatenate([x_t, vx_t], axis=0).astype(dtype)  # [C+M, N]
    if lane == "pre":
        idxT, validT = adj_t
        nbr_g = gather_neighbors_lane_pre(cat_t, adj, idxT, validT)
        nbr_t = jnp.concatenate([cat_t[:, None, :], nbr_g], axis=1)
    elif lane:
        # clamped: padding slots gather finite garbage, provably zeroed by
        # the mult_rows multiply on q below — saves the zero-column pad
        nbr_g = gather_neighbors_lane(cat_t, adj, adj_t, clamped=True)
        nbr_t = jnp.concatenate([cat_t[:, None, :], nbr_g], axis=1)
    else:
        cat = cat_t.T                                          # small transpose
        cat_nbr = gather_neighbors(cat, adj, adj_t)            # [N, K, C+M]
        cat_nbr = jnp.concatenate([cat[:, None, :], cat_nbr], axis=1)
        nbr_t = jnp.transpose(cat_nbr, (2, 1, 0))              # [C+M, K+1, N]
    x_nbr_t = nbr_t[:in_ch]
    vx_nbr_t = nbr_t[in_ch:]

    logits_t = ux_t[:, None, :].astype(dtype) + vx_nbr_t + c[:, None, None].astype(dtype)
    q_t = jax.nn.softmax(logits_t.astype(jnp.float32), axis=0)  # over M
    q_t = (q_t * mult_rows[None, :, :]).astype(dtype)          # [M, K+1, N]

    z_t = _aggregate_nminor(q_t, x_nbr_t)                      # [M, C, N] f32
    z_t = z_t.reshape(m * in_ch, n).astype(dtype)
    wf = jnp.transpose(w, (1, 0, 2)).reshape(out_ch, m * in_ch)
    y_t = jnp.einsum("oz,zn->on", wf.astype(dtype), z_t,
                     preferred_element_type=jnp.float32)
    # bias where deg > 0 (reference biasMask, model.py:496-500); with the
    # self slot always present this gates only all-padding rows; pre mode
    # carries the gate precomputed so the reduce isn't re-derived per step
    if gate is None:
        gate = jnp.sum(mult_rows, axis=0) > 0
    return y_t + b[:, None] * gate.astype(y_t.dtype)[None, :]


def _facet_conv_nminor_rotinv(params, x_t, adj, adj_t, mult_rows,
                              compute_dtype=None, lane: bool = False):
    """Rotation-invariant node-minor conv (first conv only — reference
    model.py:858). The assignment needs gathered + per-node-rotated
    neighbour features, so the gather stays in the node-minor/lane layout
    and only the SMALL (C ≤ 6) rotation math runs row-major; the self slot
    is analytic (rotated self-normal = +z, relative position 0) so
    self-split graphs need no extra gather."""
    u, c, w, b = params["u"], params["c"], params["w"], params["b"]
    gate = None
    if lane == "pre":
        mult_rows, gate = mult_rows
    dtype = compute_dtype or x_t.dtype
    in_ch, n = x_t.shape
    m, out_ch, _ = w.shape

    if lane == "pre":
        # RI features normalize gathered vectors, so padding slots must be
        # zero (validF), not clamped garbage
        adjT0, validF = adj
        idxT, validT = adj_t
        nbr_g = gather_neighbors_lane_pre(x_t, adjT0, idxT, validT,
                                          validF=validF)        # [C, K, N]
        x_nbr = jnp.transpose(nbr_g, (2, 1, 0))                 # [N, K, C]
        nbr_t = jnp.concatenate([x_t[:, None, :], nbr_g], axis=1)
    elif lane:
        nbr_g = gather_neighbors_lane(x_t, adj, adj_t)          # [C, K, N]
        x_nbr = jnp.transpose(nbr_g, (2, 1, 0))                 # [N, K, C]
        nbr_t = jnp.concatenate([x_t[:, None, :], nbr_g], axis=1)
    else:
        x_row = x_t.T
        x_nbr = gather_neighbors(x_row, adj, adj_t)             # [N, K, C]
        cat_nbr = jnp.concatenate([x_row[:, None, :], x_nbr], axis=1)
        nbr_t = jnp.transpose(cat_nbr, (2, 1, 0))               # [C, K+1, N]

    x_row = x_t.T
    feats = _rotation_invariant_feats(x_row, x_nbr, self_slot=True)
    logits = jnp.einsum("nkc,mc->nkm", feats, u) + c            # [N, K+1, M]
    q = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    q_t = jnp.transpose(q, (2, 1, 0))                           # [M, K+1, N]
    q_t = (q_t * mult_rows[None, :, :]).astype(dtype)

    z_t = _aggregate_nminor(q_t, nbr_t.astype(dtype))
    z_t = z_t.reshape(m * in_ch, n).astype(dtype)
    wf = jnp.transpose(w, (1, 0, 2)).reshape(out_ch, m * in_ch)
    y_t = jnp.einsum("oz,zn->on", wf.astype(dtype), z_t,
                     preferred_element_type=jnp.float32)
    if gate is None:
        gate = jnp.sum(mult_rows, axis=0) > 0
    return y_t + b[:, None] * gate.astype(y_t.dtype)[None, :]


def facet_conv_gather(
    params: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    adj: jnp.ndarray,
    variant: FacetConvVariant = FacetConvVariant.DEFAULT,
    bias_mask: bool = True,
) -> jnp.ndarray:
    """Direct (reference-shaped) formulation: gathers the [N, K, M·out]
    transformed-neighbour tensor like model.py:466-493. Used as the oracle
    for :func:`facet_conv` and for benchmarking the factorization win."""
    w, b = params["w"], params["b"]
    m, out_ch, in_ch = w.shape
    q = assignment_weights(params, x, adj, variant)            # [N, K, M]
    wx = x @ w.reshape(m * out_ch, in_ch).T                    # [N, M·out]
    wx_nbr = gather_neighbors(wx, adj).reshape(x.shape[0], adj.shape[1], m, out_ch)
    deg = neighbor_counts(adj)
    inv_deg = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1), 0.0)
    y = jnp.einsum("nkm,nkmo->no", q, wx_nbr) * inv_deg[:, None]
    if bias_mask:
        y = jnp.where((deg > 0)[:, None], y + b, y)
    else:
        y = y + b
    return y


# ---------------------------------------------------------------------------
# Position-for-assignment variants (reference model.py:610-760): the last 3
# channels (position) participate in the assignment only; weights W see the
# remaining channels. The position block of the assignment is forced
# translation-invariant via v_pos = −u_pos.
# ---------------------------------------------------------------------------

def init_facet_conv_pos_assignment(
    key: jax.Array,
    in_channels: int,            # total, including trailing 3 position chans
    out_channels: int,
    num_filters: int,
    translation_invariance: bool = False,
    std_dev: float = 0.05,
    std_dev_bias: float = 0.01,
) -> Dict[str, jnp.ndarray]:
    kw, kb, ku, kv, kc = jax.random.split(key, 5)
    in_w = in_channels - 3
    params = {
        "w": jax.random.normal(kw, (num_filters, out_channels, in_w)) * std_dev,
        "b": jax.random.normal(kb, (out_channels,)) * std_dev_bias,
        "u": jax.random.normal(ku, (num_filters, in_channels)) * std_dev,
        "c": jax.random.normal(kc, (num_filters,)) * std_dev,
    }
    if not translation_invariance:
        params["v_n"] = jax.random.normal(kv, (num_filters, in_w)) * std_dev
    return params


def facet_conv_pos_assignment(
    params: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    adj: jnp.ndarray,
    bias_mask: bool = True,
) -> jnp.ndarray:
    """Reference ``custom_conv2d_pos_for_assignment`` (model.py:610-696)."""
    u, c = params["u"], params["c"]
    in_w = u.shape[1] - 3
    u_n, u_p = u[:, :in_w], u[:, in_w:]
    v_n = params.get("v_n", -u_n)                              # model.py:639-640
    v = jnp.concatenate([v_n, -u_p], axis=-1)                  # model.py:656-658

    ux = x @ u.T
    vx = x @ v.T
    vx_nbr = gather_neighbors(vx, adj)
    q = jax.nn.softmax(ux[:, None, :] + vx_nbr + c, axis=-1)

    xn = x[:, :in_w]
    return _finish_conv(q, xn, adj, params["w"], params["b"], bias_mask)


def init_facet_conv_only_pos_assignment(
    key: jax.Array,
    in_channels: int,            # total, including trailing 3 position chans
    out_channels: int,
    num_filters: int,
    translation_invariance: bool = False,
    std_dev: float = 0.05,
    std_dev_bias: float = 0.01,
) -> Dict[str, jnp.ndarray]:
    kw, kb, ku, kv, kc = jax.random.split(key, 5)
    in_w = in_channels - 3
    params = {
        "w": jax.random.normal(kw, (num_filters, out_channels, in_w)) * std_dev,
        "b": jax.random.normal(kb, (out_channels,)) * std_dev_bias,
        "u": jax.random.normal(ku, (num_filters, 3)) * std_dev,
        "c": jax.random.normal(kc, (num_filters,)) * std_dev,
    }
    if not translation_invariance:
        params["v"] = jax.random.normal(kv, (num_filters, 3)) * std_dev
    return params


def facet_conv_only_pos_assignment(
    params: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    adj: jnp.ndarray,
) -> jnp.ndarray:
    """Assignment computed from the position block ONLY; weights see the
    remaining channels; bias unmasked (reference
    ``custom_conv2d_only_pos_for_assignment``, model.py:699-760)."""
    u, c = params["u"], params["c"]
    in_w = x.shape[-1] - 3
    xp = x[:, in_w:]
    if "v" in params:
        up_x = xp @ u.T
        vp_nbr = gather_neighbors(xp @ params["v"].T, adj)
        logits = up_x[:, None, :] + vp_nbr + c
    else:
        up_x = xp @ u.T
        up_nbr = gather_neighbors(up_x, adj)
        logits = up_x[:, None, :] - up_nbr + c
    q = jax.nn.softmax(logits, axis=-1)
    return _finish_conv(q, x[:, :in_w], adj, params["w"], params["b"], bias_mask=False)
