"""HBM-scale fused facet conv over windowed slab tables.

At ~1M nodes the unfused windowed path materializes, per conv and per
direction, the [C+M, K', N] neighbour tensor (level 0: 73 × 12 × 1.27M bf16
= 2.2 GB), the [M, K'+1, N] f32 assignment q, and the [M, C, N] aggregate z
in HBM — the profiled step is at HBM speed-of-light for that dataflow
(BASELINE.md round 4, "Million-facet step: profile and bound"). This module
computes the ENTIRE conv epilogue — gather → softmax assignment →
multiplicity/degree weighting → K-slot aggregation → [M·C → out] MXU
transform — inside the per-slab scan of the windowed gather
(graph.convert.WindowedLaneTables), so the only full-size arrays that touch
HBM in the forward are the [C+M, N] input and the [out, N] output.

The backward (custom VJP) recomputes each slab's forward (the inputs are
slab-local dynamic slices — cheap), materializes ONLY the gather-output
cotangent dG [C+M, K', N] (needed because a source column's cotangent
gathers contributions across slab boundaries), and reuses the windowed
backward slot tables (relS/validS) for the scatter-free dcat accumulation —
the same machinery as ops.gather.make_windowed_lane_gather's backward.
Round-5 profile adjudication (BASELINE.md): the dG machinery is ≤10% of
the fused million-facet step; ~50% is the slab gather row path itself
(fwd + the backward's recompute) at an effective ~5-6 ns/row, so
VMEM-strip dG accumulation was sized and NOT built — the next structural
lever is Mosaic dynamic-gather support, not dataflow restructuring.

Halo-extended inputs (D > 1 sharded levels, ``geometry`` with
``num_sources > num_out``): ``cat_t`` is the halo-extended [C+M, N + H]
array (the caller runs the halo exchange first), the windowed table pack
carries the 4-array tail pack, slots pointing at halo columns are masked
out of the banded take and added from a flat take on the small [C+M, H]
tail, and the backward returns the full [C+M, N + H] cotangent so the
exchange's autodiff routes boundary cotangents to their owners. At D == 1
the emitted program is unchanged.

Semantics match the win-branch of parallel.halo._sharded_conv_nminor
(aggregate-then-transform factorization of the reference conv,
model.py:407-501, on a self-split deduped graph) up to fp reassociation;
tests/test_windowed_gather.py pins value and gradient parity against the
unfused path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_windowed_fused_conv(geometry):
    """Build the fused conv for one level's static window ``geometry``
    (``WindowedLaneTables.geometry``: block, window, bwd_window,
    num_sources, num_out).

    Returns ``f(cat_t, ux_t, wf, c, mult_rows, *win_arrays) -> y [out, N]``
    (f32, bias NOT applied — the caller adds the degree-gated bias):

    - ``cat_t`` [C+M, N (+H)]: [x | proj·x] activations, already in the
      compute dtype (the caller's cast) — C = in_ch feature rows, M
      projection rows; halo-extended when the geometry has a tail;
    - ``ux_t`` [M, N]: the per-node assignment term u·x (compute dtype
      applied inside, mirroring the unfused path);
    - ``wf`` [out, M·C]: the transform, ``transpose(w,(1,0,2)).reshape``;
    - ``c`` [M]: assignment bias;
    - ``mult_rows`` [K'+1, N]: fused multiplicity × 1/deg rows (slot 0 =
      self; 0 on padding slots — this is what zeroes the clamped gather's
      in-window garbage);
    - ``win_arrays``: ``WindowedLaneTables.arrays`` (7 entries, +4 tail
      entries when the level is halo-extended).
    """
    block, window, bwd_window, num_sources, num_out = map(int, geometry)
    has_tail = num_sources > num_out
    n_tabs = 11 if has_tail else 7

    def _tail_pad(cat_t):
        # loop-invariant: built once per scan, NOT per slab (matches the
        # sibling form in ops.gather.make_windowed_lane_gather)
        return jnp.concatenate(
            [jnp.zeros_like(cat_t[:, :1]), cat_t[:, num_out:]], axis=1)

    def _slab_forward(cat_t, tail_pad, ux_t, c, mult_rows, xs, dtype, in_ch):
        cm = cat_t.shape[0]
        m = ux_t.shape[0]
        if has_tail:
            os_, ws, r, nt, tt = xs
        else:
            os_, ws, r = xs
        win = jax.lax.dynamic_slice(cat_t, (0, ws), (cm, window))
        g = jnp.take(win, r, axis=1)                       # [CM, K, block]
        if has_tail:
            g = g * nt.astype(cat_t.dtype) + jnp.take(tail_pad, tt, axis=1)
        self_c = jax.lax.dynamic_slice(cat_t, (0, os_), (cm, block))
        nbr = jnp.concatenate([self_c[:, None, :], g], axis=1)  # [CM, K+1, b]
        mr = jax.lax.dynamic_slice(mult_rows, (0, os_),
                                   (mult_rows.shape[0], block))
        uxs = jax.lax.dynamic_slice(ux_t, (0, os_), (m, block))
        logits = (uxs[:, None, :].astype(dtype) + nbr[in_ch:]
                  + c[:, None, None].astype(dtype))        # [M, K+1, block]
        q_raw = jax.nn.softmax(logits.astype(jnp.float32), axis=0)
        q = (q_raw * mr[None]).astype(dtype)               # [M, K+1, block]
        x_nbr = nbr[:in_ch]                                # [C, K+1, block]
        z = jnp.sum(q[:, None] * x_nbr[None], axis=2,
                    dtype=jnp.float32)                     # [M, C, block]
        return nbr, mr, q_raw, q, x_nbr, z

    def _fwd_xs(tabs):
        if has_tail:
            return (tabs[0], tabs[1], tabs[2], tabs[7], tabs[8])
        return (tabs[0], tabs[1], tabs[2])

    @jax.custom_vjp
    def fused(cat_t, ux_t, wf, c, mult_rows, *tabs):
        dtype = cat_t.dtype
        m = ux_t.shape[0]
        in_ch = cat_t.shape[0] - m
        out_ch = wf.shape[0]
        # + cat_t[0,0]*0: inherit the shard_map varying-axis type (see
        # ops.gather.make_windowed_lane_gather)
        y = jnp.zeros((out_ch, num_out), jnp.float32) + (
            cat_t[0, 0] * 0).astype(jnp.float32)
        tp = _tail_pad(cat_t) if has_tail else None

        def blk(y, xs):
            os_ = xs[0]
            _, _, _, _, _, z = _slab_forward(
                cat_t, tp, ux_t, c, mult_rows, xs, dtype, in_ch)
            z_dt = z.reshape(m * in_ch, block).astype(dtype)
            y_s = jnp.einsum("oz,zn->on", wf.astype(dtype), z_dt,
                             preferred_element_type=jnp.float32)
            return jax.lax.dynamic_update_slice(y, y_s, (0, os_)), None

        y, _ = jax.lax.scan(blk, y, _fwd_xs(tabs))
        return y

    def _fwd(cat_t, ux_t, wf, c, mult_rows, *tabs):
        y = fused(cat_t, ux_t, wf, c, mult_rows, *tabs)
        return y, (cat_t, ux_t, wf, c, mult_rows, tabs)

    def _bwd(res, gy):
        (cat_t, ux_t, wf, c, mult_rows, tabs) = res
        out_starts = tabs[0]
        relT = tabs[2]
        bwd_starts, relS, validS = tabs[4], tabs[5], tabs[6]
        dtype = cat_t.dtype
        cm = cat_t.shape[0]
        m = ux_t.shape[0]
        in_ch = cm - m
        k = relT.shape[1]

        # the LAST slab overlaps its predecessor (identical values for the
        # overlap columns): idempotent dynamic_update writes are safe, but
        # the dw/dc accumulators would double-count — mask the re-covered
        # prefix of each slab's columns out of the accumulation terms
        prev_end = jnp.concatenate(
            [jnp.zeros((1,), out_starts.dtype), out_starts[:-1] + block])
        fresh_off = jnp.maximum(prev_end - out_starts, 0)  # [nblk]

        zero = (cat_t[0, 0] * 0).astype(jnp.float32)
        dG = jnp.zeros((cm, k, num_out), dtype) + zero.astype(dtype)
        dcat_self = jnp.zeros((cm, num_out), dtype) + zero.astype(dtype)
        dux = jnp.zeros((m, num_out), jnp.float32) + zero
        dw_acc = jnp.zeros(wf.shape, jnp.float32) + zero
        dc_acc = jnp.zeros((m,), jnp.float32) + zero

        tp = _tail_pad(cat_t) if has_tail else None

        def blk(carry, xs):
            dG, dcat_self, dux, dw_acc, dc_acc = carry
            fwd_xs, fo = xs
            os_ = fwd_xs[0]
            nbr, mr, q_raw, q, x_nbr, z = _slab_forward(
                cat_t, tp, ux_t, c, mult_rows, fwd_xs, dtype, in_ch)
            gy_s = jax.lax.dynamic_slice(gy, (0, os_),
                                         (gy.shape[0], block))  # [out, b] f32
            fresh = (jnp.arange(block) >= fo).astype(jnp.float32)[None, :]

            # y_s = wf_dt @ z_dt: dz through the dtype casts
            z_dt = z.reshape(m * in_ch, block).astype(dtype)
            dz = jnp.einsum("oz,on->zn", wf.astype(dtype).astype(jnp.float32),
                            gy_s)                          # [M·C, b] f32
            dw_acc = dw_acc + jnp.einsum("on,zn->oz", gy_s * fresh,
                                         z_dt.astype(jnp.float32))
            dz = dz.reshape(m, in_ch, block)

            # z = Σ_k q·x_nbr: its backward written as broadcast-multiply +
            # f32-accumulated reduce, NOT einsum — the n-batched tiny-matrix
            # dot_general forces operand/result layout canonicalization
            # copies (the _aggregate_nminor lesson, BASELINE.md round 2)
            dq = jnp.sum(dz[:, :, None, :] * x_nbr[None].astype(jnp.float32),
                         axis=1, dtype=jnp.float32)        # [M, K+1, b]
            dx_nbr = jnp.sum(dz[:, :, None, :] * q[:, None].astype(jnp.float32),
                             axis=0, dtype=jnp.float32).astype(dtype)

            # q = cast(q_raw · mr); softmax over M
            dq_raw = dq * mr[None]
            dlog = q_raw * (dq_raw - jnp.sum(q_raw * dq_raw, axis=0,
                                             keepdims=True))  # [M, K+1, b]
            dc_acc = dc_acc + jnp.sum(dlog * fresh[None], axis=(1, 2))
            dux_s = jnp.sum(dlog, axis=1)                  # [M, b]
            dux = jax.lax.dynamic_update_slice(dux, dux_s, (0, os_))

            dvx_nbr = dlog.astype(dtype)                   # [M, K+1, b]
            dnbr = jnp.concatenate([dx_nbr, dvx_nbr], axis=0)  # [CM, K+1, b]
            dcat_self = jax.lax.dynamic_update_slice(
                dcat_self, dnbr[:, 0, :], (0, os_))
            dG = jax.lax.dynamic_update_slice(dG, dnbr[:, 1:, :], (0, 0, os_))
            return (dG, dcat_self, dux, dw_acc, dc_acc), None

        (dG, dcat_self, dux, dw_acc, dc_acc), _ = jax.lax.scan(
            blk, (dG, dcat_self, dux, dw_acc, dc_acc),
            (_fwd_xs(tabs), fresh_off))

        # scatter-free dcat from the gather-output cotangent dG — identical
        # machinery to make_windowed_lane_gather's backward
        dcat = jnp.zeros((cm, num_out), dtype) + zero.astype(dtype)

        def blk2(dcat, xs):
            os_, bs, rs, vs = xs
            gwin = jax.lax.dynamic_slice(dG, (0, 0, bs), (cm, k, bwd_window))
            gf = gwin.reshape(cm, k * bwd_window)
            d = jnp.take(gf, rs, axis=1)                   # [CM, S, block]
            d = jnp.sum(d * vs.astype(gf.dtype)[None], axis=1)
            return jax.lax.dynamic_update_slice(dcat, d, (0, os_)), None

        dcat, _ = jax.lax.scan(blk2, dcat,
                               (out_starts, bwd_starts, relS, validS))
        dcat = dcat + dcat_self
        if has_tail:
            # tail cotangent: flat transpose gather over dG's k·N + n slots
            # (the tail is halo-fraction-sized; the exchange's autodiff
            # routes these columns back to their owning shards)
            tailS, tailV = tabs[9], tabs[10]
            gf = dG.reshape(cm, -1)
            dt = jnp.take(gf, tailS, axis=1)               # [CM, S, H]
            dt = jnp.sum(dt * tailV.astype(gf.dtype)[None], axis=1)
            dcat = jnp.concatenate([dcat, dt], axis=1)     # [CM, N + H]
        return (dcat, dux.astype(ux_t.dtype), dw_acc.astype(wf.dtype),
                dc_acc.astype(c.dtype), None) + (None,) * n_tabs

    fused.defvjp(_fwd, _bwd)
    return fused
