"""Fused Pallas epilogue for the facet graph convolution.

Why this kernel exists (measured on TPU v5e, 25600-node level):

XLA lowers the conv's per-edge softmax + weighted aggregation to VPU reduce
fusions that want the node axis minormost, while the gather produces (and the
scatter-free gather backward consumes) row-major ``[rows, W]`` tensors. XLA
therefore inserts layout copies around every ``[N,K,C]``-sized intermediate —
~7 ms of a ~21 ms training step. Keeping the whole epilogue in ONE kernel that
reads the gather's native layout and writes the backward's native layout
removes those copies; the arithmetic itself is the same (VPU multiply-
accumulate, register-accumulated per output slice).

Forward math (identical to ``ops.conv._facet_conv_fused`` on a self-split
deduped graph; reference ``custom_conv2d``, model.py:427-504):

    logits_k = u·x_i + v·x_j(k) + c            (slot 0 = self: x_j = x_i)
    q_k      = softmax_M(logits_k) · mult_k / deg_i
    z_i      = Σ_k q_k ⊗ x_j(k)                → [N, M·C] flat
    y_i      = z_i · W_flat + bias             (MXU matmul, outside)

The gather is slot-major: ``gathered[k] = cat[adj_sm[k] - 1]`` with a zero row
for pad slots, a free reshape of the flat XLA gather. The backward kernel
recomputes the softmax (cheaper than saving q) and emits the row-major
cotangent ``d(gathered)`` that the transpose-slot map consumes without any
relayout.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pick_tile(n: int, preferred: int = 256) -> int:
    """Largest power-of-two tile ≤ preferred that divides n."""
    t = preferred
    while t > 8 and n % t != 0:
        t //= 2
    if n % t != 0:
        raise ValueError(f"node count {n} has no power-of-two tile ≥ 8")
    return t


# ---------------------------------------------------------------------------
# Slot-major gather with scatter-free backward
# ---------------------------------------------------------------------------

@jax.custom_vjp
def gather_slot_major(cat, adj_sm, adj_t_sm):
    """``cat`` [N, W], ``adj_sm`` [K, N] one-indexed (0 = pad) →
    [K, N, W]; pad slots gather a zero row."""
    padded = jnp.concatenate([jnp.zeros_like(cat[:1]), cat], axis=0)
    k, n = adj_sm.shape
    return jnp.take(padded, adj_sm.reshape(-1), axis=0).reshape(k, n, -1)


def _gsm_fwd(cat, adj_sm, adj_t_sm):
    return gather_slot_major(cat, adj_sm, adj_t_sm), (adj_t_sm,)


def _gsm_bwd(res, g):
    # adj_t_sm lists one-indexed flat slots k·N + n per source row (built from
    # transpose_adjacency(adj_sm), which flattens row-major over [K, N])
    (adj_t_sm,) = res
    k, n, w = g.shape
    g_flat = g.reshape(k * n, w)
    g_pad = jnp.concatenate([jnp.zeros_like(g_flat[:1]), g_flat], axis=0)
    dcat = jnp.sum(jnp.take(g_pad, adj_t_sm, axis=0), axis=1)
    return dcat, None, None


gather_slot_major.defvjp(_gsm_fwd, _gsm_bwd)


# ---------------------------------------------------------------------------
# Fused epilogue kernels
# ---------------------------------------------------------------------------

def _softmax_lanes(logits):
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _epilogue_fwd_kernel(g_ref, cat_ref, ux_ref, mult_ref, c_ref, z_ref,
                         *, k_slots, m, c_in, acc_dtype):
    """One node tile: softmax + multiplicity + aggregation, register-
    accumulated per m-slice. Slot 0 is the local (self) row."""
    cvec = c_ref[...].astype(acc_dtype)                      # [1, M]
    ux = ux_ref[...].astype(acc_dtype)                       # [T, M]
    qs = []
    for k in range(k_slots + 1):
        src = cat_ref[...] if k == 0 else g_ref[k - 1]
        logits = ux + src[:, c_in:].astype(acc_dtype) + cvec
        q = _softmax_lanes(logits) * mult_ref[k].astype(acc_dtype)
        qs.append(q)
    for mm in range(m):
        acc = qs[0][:, mm:mm + 1] * cat_ref[:, :c_in].astype(acc_dtype)
        for k in range(1, k_slots + 1):
            acc = acc + qs[k][:, mm:mm + 1] * g_ref[k - 1][:, :c_in].astype(acc_dtype)
        z_ref[:, mm * c_in:(mm + 1) * c_in] = acc.astype(z_ref.dtype)


def _epilogue_bwd_kernel(g_ref, cat_ref, ux_ref, mult_ref, c_ref, dz_ref,
                         dg_ref, dcat_ref, dux_ref, dq_scratch,
                         *, k_slots, m, c_in, acc_dtype):
    """Recompute softmax; emit row-major cotangents for the gathered slots,
    the local row, and ux.

    The slot loop is a ``fori_loop`` with dynamic leading-dim ref indexing —
    unrolling it makes Mosaic keep every iteration's temporaries live on the
    kernel stack and blows the 16 MB scoped-VMEM limit."""
    cvec = c_ref[...].astype(acc_dtype)                      # [1, M]
    ux = ux_ref[...].astype(acc_dtype)
    dz = dz_ref[...].astype(acc_dtype)                       # [T, M*C]
    t = ux.shape[0]

    def slot_cotangents(src, mult_k):
        x_k = src[:, :c_in].astype(acc_dtype)                # [T, C]
        logits = ux + src[:, c_in:].astype(acc_dtype) + cvec
        s = _softmax_lanes(logits)                           # [T, M]
        # dx_k = Σ_m (s·mult)[m] · dz_m ;  dq_k[m] = Σ_c x_k · dz_m
        dx = jnp.zeros((t, c_in), acc_dtype)
        for mm in range(m):
            dz_m = dz[:, mm * c_in:(mm + 1) * c_in]
            dx = dx + (s[:, mm:mm + 1] * mult_k) * dz_m
            dq_scratch[:, mm:mm + 1] = jnp.sum(x_k * dz_m, axis=-1,
                                               keepdims=True)
        dq = dq_scratch[...] * mult_k
        # softmax jacobian: dlogits = s ⊙ (dq − Σ_m dq ⊙ s)
        dlog = s * (dq - jnp.sum(dq * s, axis=-1, keepdims=True))
        dsrc = jnp.concatenate(
            [dx.astype(dg_ref.dtype), dlog.astype(dg_ref.dtype)], axis=-1
        )
        return dsrc, dlog

    dsrc0, dlog0 = slot_cotangents(cat_ref[...], mult_ref[0])
    dcat_ref[...] = dsrc0

    def body(k, dux_acc):
        dsrc, dlog = slot_cotangents(g_ref[k], mult_ref[k + 1])
        dg_ref[k] = dsrc
        return dux_acc + dlog

    dux_acc = jax.lax.fori_loop(0, k_slots, body, dlog0)
    dux_ref[...] = dux_acc.astype(dux_ref.dtype)


def _specs(k_slots, t, w, m_filters):
    in_specs = [
        pl.BlockSpec((k_slots, t, w), lambda i: (0, i, 0)),      # gathered
        pl.BlockSpec((t, w), lambda i: (i, 0)),                  # cat (local)
        pl.BlockSpec((t, m_filters), lambda i: (i, 0)),          # ux
        pl.BlockSpec((k_slots + 1, t, 1), lambda i: (0, i, 0)),  # mult rows
        pl.BlockSpec((1, m_filters), lambda i: (0, 0)),          # c
    ]
    return in_specs


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6)
)
def conv_epilogue(gathered, cat, ux, mult_rows, c, compute_dtype, interpret):
    """z [N, M·C] from the gathered slot-major tensor (see module docstring).

    ``gathered`` [K, N, W] (W = C+M), ``cat`` [N, W], ``ux`` [N, M],
    ``mult_rows`` [K+1, N, 1] fused multiplicity×1/deg (slot 0 = self),
    ``c`` [1, M]. Differentiable in everything but ``mult_rows``.
    """
    z, _ = _conv_epilogue_fwd(gathered, cat, ux, mult_rows, c,
                              compute_dtype, interpret)
    return z


def _conv_epilogue_fwd(gathered, cat, ux, mult_rows, c, compute_dtype,
                       interpret):
    k_slots, n, w = gathered.shape
    m = ux.shape[-1]
    c_in = w - m
    t = pick_tile(n)
    acc_dtype = jnp.float32
    out_dtype = compute_dtype or cat.dtype
    kernel = functools.partial(
        _epilogue_fwd_kernel, k_slots=k_slots, m=m, c_in=c_in,
        acc_dtype=acc_dtype,
    )
    z = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, m * c_in), out_dtype),
        grid=(n // t,),
        in_specs=_specs(k_slots, t, w, m),
        out_specs=pl.BlockSpec((t, m * c_in), lambda i: (i, 0)),
        interpret=interpret,
    )(gathered, cat, ux, mult_rows, c)
    return z, (gathered, cat, ux, mult_rows, c)


def _conv_epilogue_bwd(compute_dtype, interpret, res, dz):
    gathered, cat, ux, mult_rows, c = res
    k_slots, n, w = gathered.shape
    m = ux.shape[-1]
    c_in = w - m
    t = pick_tile(n)
    kernel = functools.partial(
        _epilogue_bwd_kernel, k_slots=k_slots, m=m, c_in=c_in,
        acc_dtype=jnp.float32,
    )
    dg, dcat, dux = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct(gathered.shape, gathered.dtype),
            jax.ShapeDtypeStruct(cat.shape, cat.dtype),
            jax.ShapeDtypeStruct((n, m), jnp.float32),
        ],
        grid=(n // t,),
        in_specs=_specs(k_slots, t, w, m) + [
            pl.BlockSpec((t, m * c_in), lambda i: (i, 0)),       # dz
        ],
        out_specs=[
            pl.BlockSpec((k_slots, t, w), lambda i: (0, i, 0)),
            pl.BlockSpec((t, w), lambda i: (i, 0)),
            pl.BlockSpec((t, m), lambda i: (i, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((t, m), jnp.float32)],
        interpret=interpret,
    )(gathered, cat, ux, mult_rows, c, dz)
    dc = jnp.sum(dux, axis=0, keepdims=True).astype(c.dtype)
    return dg, dcat, dux.astype(ux.dtype), jnp.zeros_like(mult_rows), dc


conv_epilogue.defvjp(_conv_epilogue_fwd, _conv_epilogue_bwd)


# ---------------------------------------------------------------------------
# Full conv wrapper
# ---------------------------------------------------------------------------

def facet_conv_pallas(
    params: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    adj_sm: jnp.ndarray,
    adj_t_sm: jnp.ndarray,
    mult_rows: jnp.ndarray,
    translation_invariant: bool = False,
    compute_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Facet conv with the fused Pallas epilogue: ``x`` [N, C] → [N, out].

    ``adj_sm`` [K, N] slot-major neighbours-only one-indexed K-list,
    ``adj_t_sm`` its transpose map over slot-major flat slots,
    ``mult_rows`` [K+1, N, 1] from
    :func:`facet_graph_convolution_tpu.graph.convert.fused_mult_rows`
    (slot 0 = self). Matches :func:`facet_graph_convolution_tpu.ops.conv.
    facet_conv` to float tolerance (reference custom_conv2d,
    model.py:427-504).
    """
    u, c, w, b = params["u"], params["c"], params["w"], params["b"]
    dtype = compute_dtype or x.dtype
    n, in_ch = x.shape
    m, out_ch, _ = w.shape

    # the graph arrays are host-padded to a tileable node count
    # (slot_major_arrays); pad x to match and slice the output back. Padded
    # destinations have all-zero mult rows → zero output rows.
    pad = mult_rows.shape[1] - n
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))

    proj = -u if translation_invariant else params["v"]
    vx = x @ proj.T
    ux = (x @ u.T).astype(dtype)
    cat = jnp.concatenate([x.astype(dtype), vx.astype(dtype)], axis=-1)
    gathered = gather_slot_major(cat, adj_sm, adj_t_sm)

    z = conv_epilogue(
        gathered, cat, ux, mult_rows, c.reshape(1, -1).astype(jnp.float32),
        dtype, interpret,
    )
    wf = jnp.transpose(w, (1, 0, 2)).reshape(out_ch, m * in_ch)
    y = jnp.einsum("nz,oz->no", z, wf.astype(dtype),
                   preferred_element_type=jnp.float32)
    gate = (jnp.sum(mult_rows[:, :, 0], axis=0) > 0).astype(y.dtype)
    y = y + b[None, :] * gate[:, None]
    return y[:n] if pad else y


def slot_major_arrays(
    adj_nbr: np.ndarray, mult_nbr: np.ndarray, self_mult: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side prep for :func:`facet_conv_pallas` from the self-split
    deduped K-list (graph.convert.split_self_klist): returns
    ``(adj_sm [K, N], adj_t_sm, mult_rows [K+1, N, 1])`` with the degree
    normalizer folded into the static multiplicities."""
    from facet_graph_convolution_tpu.graph.convert import (
        fused_mult_rows,
        transpose_adjacency,
    )

    adj_sm = np.ascontiguousarray(adj_nbr.T.astype(np.int32))
    n = adj_nbr.shape[0]
    rows = fused_mult_rows(mult_nbr, self_mult)                # [K+1, N]
    # pad the node axis to a tileable size BEFORE building the transpose map
    # (its flat slots are strided by the padded N); padded destinations get
    # all-pad adjacency and zero mult rows
    target = -(-n // 256) * 256 if n >= 256 else -(-n // 8) * 8
    if target != n:
        adj_sm = np.pad(adj_sm, ((0, 0), (0, target - n)))
        rows = np.pad(rows, ((0, 0), (0, target - n)))
    adj_t_sm = transpose_adjacency(adj_sm, num_targets=target)
    return adj_sm, adj_t_sm, rows[:, :, None].astype(np.float32)
