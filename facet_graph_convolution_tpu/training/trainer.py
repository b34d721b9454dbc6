"""Training drivers.

TPU-first re-design of the reference training loops:

- ONE jitted step computes forward + loss + gradients + Adam update, versus
  the reference's three separate ``sess.run`` calls per iteration (loss,
  train_step, NaN scan — train.py:577,619-620 — each re-running the forward
  pass and re-uploading the patch via feed_dict);
- rotation augmentation and loss-face sampling happen in-graph under
  ``jax.random`` (reference generates both on host per step,
  train.py:558-565);
- patches are bucket-padded so XLA compiles a handful of shapes instead of
  one program per mesh.

Drivers: :func:`train_normals` (reference ``trainNet``, train.py:380-632) and
:func:`train_with_vertices` (reference ``trainAccuracyNet``/
``trainDoubleLossNet``, train.py:636-1267).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from facet_graph_convolution_tpu.config import Config
from facet_graph_convolution_tpu.data.dataset import (
    FacetPatch,
    MeshDataset,
    bucket_size,
    pad_patch_to,
)
from facet_graph_convolution_tpu.models.augment import (
    random_rotation,
    rotate_inputs,
    rotate_vec3,
)
from facet_graph_convolution_tpu.models.losses import (
    face_normals_loss,
    full_chamfer_loss,
)
from facet_graph_convolution_tpu.models.unet import (
    init_unet,
    unet_apply,
    unet_apply_nminor,
    unet_apply_pallas,
)
from facet_graph_convolution_tpu.ops.conv import FacetConvVariant
from facet_graph_convolution_tpu.ops.normalization import normalize_tensor
from facet_graph_convolution_tpu.ops.vertex_update import update_positions_multiscale
from facet_graph_convolution_tpu.training.checkpoint import CheckpointManager


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(
    key: jax.Array,
    cfg: Config,
    multi_scale: bool = False,
    in_channels: int = 6,
    num_steps: Optional[int] = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    """``num_steps`` sizes the cosine decay horizon when
    ``cfg.train.lr_schedule == "cosine"`` (drivers pass their iteration
    budget); constant-LR ignores it."""
    params = init_unet(
        key,
        in_channels=in_channels,
        channels=tuple(cfg.model.channels),
        num_filters=cfg.model.num_filters,
        fc_channels=cfg.model.fc_channels,
        out_channels=cfg.model.out_channels,
        multi_scale=multi_scale,
        std_dev=cfg.model.std_dev,
        std_dev_bias=cfg.model.std_dev_bias,
        variant=_config_variant(cfg),
    )
    if cfg.train.lr_schedule == "cosine":
        total = num_steps or cfg.train.num_iterations
        warmup = min(cfg.train.lr_warmup_steps, max(total // 10, 1))
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.train.learning_rate,
            warmup_steps=warmup,
            decay_steps=max(total, warmup + 1),
            end_value=cfg.train.learning_rate * cfg.train.lr_min_ratio,
        )
    elif cfg.train.lr_schedule == "constant":
        lr = cfg.train.learning_rate
    else:
        raise ValueError(f"unknown lr_schedule: {cfg.train.lr_schedule!r}")
    tx = optax.adam(lr)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


# ---------------------------------------------------------------------------
# Normals-supervised step (reference trainNet)
# ---------------------------------------------------------------------------

def make_normals_train_step(
    tx: optax.GradientTransformation,
    cfg: Config,
    augment: Optional[bool] = None,
):
    """Build the jitted (state, x, adjs, gt, key) → (state, loss) step."""
    augment = cfg.train.augment_rotations if augment is None else augment
    loss_samples = cfg.train.loss_samples
    steps = cfg.model.coarsening_steps
    compute_dtype = (
        jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else None
    )
    variant = _config_variant(cfg)
    alpha = cfg.model.lrelu_alpha

    def step(state: TrainState, x, adjs, gt, key, adj_ts=None, mults=None):
        rot_key, samp_key = jax.random.split(key)
        if augment:
            rot = random_rotation(rot_key)
            x = rotate_inputs(rot, x)
            gt = rotate_vec3(rot, gt)
        sample_idx = jax.random.randint(samp_key, (loss_samples,), 0, x.shape[0])

        def loss_fn(params):
            y = _apply_model(
                params, x, adjs, adj_ts, mults, steps=steps,
                variant=variant, alpha=alpha, compute_dtype=compute_dtype,
            )
            y = normalize_tensor(y)
            return face_normals_loss(
                jnp.take(y, sample_idx, axis=0), jnp.take(gt, sample_idx, axis=0)
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return jax.jit(step)


def _config_variant(cfg: Config) -> FacetConvVariant:
    """Resolve the conv variant from the config invariance flags (reference
    bTransInvariant/bRotInvariant, model.py:841-842)."""
    if cfg.model.rotation_invariance:
        return FacetConvVariant.ROTATION_INVARIANT
    if cfg.model.translation_invariance:
        return FacetConvVariant.TRANSLATION_INVARIANT
    return FacetConvVariant.DEFAULT


def make_normals_eval_step(cfg: Config):
    loss_samples = cfg.train.loss_samples
    steps = cfg.model.coarsening_steps
    variant = _config_variant(cfg)
    alpha = cfg.model.lrelu_alpha

    def eval_step(params, x, adjs, gt, key, adj_ts=None, mults=None):
        sample_idx = jax.random.randint(key, (loss_samples,), 0, x.shape[0])
        y = normalize_tensor(
            _apply_model(params, x, adjs, adj_ts, mults, steps=steps,
                         variant=variant, alpha=alpha)
        )
        return face_normals_loss(
            jnp.take(y, sample_idx, axis=0), jnp.take(gt, sample_idx, axis=0)
        )

    return jax.jit(eval_step)


def _bucketed(patch: FacetPatch, align: int) -> FacetPatch:
    return pad_patch_to(patch, bucket_size(patch.num_nodes, align))


def _patch_arrays(patch: FacetPatch, optimize_graph: bool = True,
                  split_self: bool = True, nminor: bool = True,
                  pallas: bool = False, lane=True,
                  to_device: bool = True):
    """Compile the patch graph for the train step: dedupe duplicate K-list
    slots into multiplicity weights, split the self slot out (its features
    need no gather), and build transpose slot maps for the scatter-free
    backward (all exact transformations — tests test_transpose_gather.py).

    The default (``nminor``) form feeds the node-minor fast path: the mult
    entry is ``{"rows": [K+1, N]}`` fused multiplicity/degree rows
    (graph.convert.fused_mult_rows). ``nminor=False`` keeps the row-major
    self-split form ``(mult_nbr, self_mult)``; ``split_self=False`` the
    plain dedup form (required for the rotation-invariant variant, whose
    assignment gathers the self slot's features)."""
    conv = jnp.asarray if to_device else np.asarray
    x = conv(patch.inputs)
    gt = conv(patch.gt_normals)
    if not optimize_graph:
        return x, tuple(conv(a) for a in patch.adjs), gt, None, None
    adjs, adj_ts, mults = _graph_arrays(
        patch.adjs, split_self=split_self, nminor=nminor, pallas=pallas,
        lane=lane, to_device=to_device,
    )
    return x, adjs, gt, adj_ts, mults


def _graph_arrays(adjs_raw, split_self: bool = True, nminor: bool = True,
                  pallas: bool = False, lane=True,
                  to_device: bool = True):
    """Per-level optimized graph arrays ``(adjs, adj_ts, mults)`` from raw
    one-indexed K-lists — the forms :func:`_apply_model` dispatches on.
    ``lane`` (node-minor only, the default) emits transposed [K, N] K-lists
    + lane slot maps so the convs gather along the lane axis with zero
    gather-boundary transposes (measured 45.1M → 50.2M edges/s on the
    training step, BASELINE.md)."""
    from facet_graph_convolution_tpu.graph.convert import (
        dedupe_klist,
        fused_mult_rows,
        split_self_klist,
        transpose_adjacency,
    )

    conv = jnp.asarray if to_device else np.asarray
    adjs, adj_ts, mults = [], [], []
    for a in adjs_raw:
        a_u, mult = dedupe_klist(np.asarray(a))
        if split_self:
            a_u, mult_n, self_mult = split_self_klist(a_u, mult)
            if pallas:
                from facet_graph_convolution_tpu.ops.pallas_conv import (
                    slot_major_arrays,
                )

                adj_sm, adj_t_sm, rows = slot_major_arrays(
                    a_u, mult_n, self_mult
                )
                adjs.append(conv(adj_sm))
                adj_ts.append(conv(adj_t_sm))
                mults.append({"pallas_rows": conv(rows)})
                continue
            if nminor:
                rows_np = fused_mult_rows(mult_n, self_mult)
                rows = conv(rows_np)
                if lane == "pre":
                    # pre-derived tables: clamp/mask/gate index math done
                    # here, once per patch, so per-step bank selection stays
                    # take-only (graph.convert.lane_tables_pre)
                    from facet_graph_convolution_tpu.graph.convert import (
                        lane_tables_pre,
                    )

                    adjT0, validF, idxT, validT = lane_tables_pre(a_u)
                    gate = rows_np.sum(axis=0) > 0
                    adjs.append((conv(adjT0), conv(validF)))
                    adj_ts.append((conv(idxT), conv(validT)))
                    mults.append({"rows_lane_pre": (rows, conv(gate))})
                    continue
                if lane:
                    from facet_graph_convolution_tpu.graph.convert import (
                        lane_tables,
                    )

                    adjT, adjT_t = lane_tables(a_u)
                    adjs.append(conv(adjT))
                    adj_ts.append(conv(adjT_t))
                    mults.append({"rows_lane": rows})
                    continue
                mults.append({"rows": rows})
            else:
                mults.append((conv(mult_n), conv(self_mult)))
        else:
            mults.append(conv(mult))
        adjs.append(conv(a_u))
        adj_ts.append(conv(transpose_adjacency(a_u)))
    return tuple(adjs), tuple(adj_ts), tuple(mults)


def _apply_model(params, x, adjs, adj_ts, mults, *, steps, variant, alpha,
                 compute_dtype=None, multi_scale=False):
    """Dispatch on the graph-array form: node-minor fast path when mults
    carry fused rows, the Pallas epilogue when they carry slot-major rows,
    the row-major path otherwise."""
    if mults is not None and len(mults) and isinstance(mults[0], dict):
        if "pallas_rows" in mults[0]:
            return unet_apply_pallas(
                params, x, adjs, adj_ts,
                [mm["pallas_rows"] for mm in mults],
                coarsening_steps=steps, multi_scale=multi_scale,
                variant=variant, alpha=alpha, compute_dtype=compute_dtype,
            )
        if "rows_lane_pre" in mults[0]:
            return unet_apply_nminor(
                params, x, adjs, adj_ts,
                [mm["rows_lane_pre"] for mm in mults],
                coarsening_steps=steps, multi_scale=multi_scale,
                variant=variant, alpha=alpha, compute_dtype=compute_dtype,
                lane="pre",
            )
        if "rows_lane" in mults[0]:
            return unet_apply_nminor(
                params, x, adjs, adj_ts, [mm["rows_lane"] for mm in mults],
                coarsening_steps=steps, multi_scale=multi_scale,
                variant=variant, alpha=alpha, compute_dtype=compute_dtype,
                lane=True,
            )
        return unet_apply_nminor(
            params, x, adjs, adj_ts, [mm["rows"] for mm in mults],
            coarsening_steps=steps, multi_scale=multi_scale,
            variant=variant, alpha=alpha, compute_dtype=compute_dtype,
        )
    return unet_apply(
        params, x, adjs, coarsening_steps=steps, multi_scale=multi_scale,
        compute_dtype=compute_dtype, adj_ts=adj_ts, mults=mults,
        variant=variant, alpha=alpha,
    )


def _stack_patch_arrays(arrays, width_state=None, to_device: bool = True):
    """Stack per-patch arrays for on-device selection: all patches must share
    one fine-node bucket; per-patch K'/K_t widths are zero-padded to the max
    (extra zero slots are inert: zero-row gather + zero multiplicity).

    ``width_state`` (a mutable dict) makes widths MONOTONE across calls:
    each 2-D leaf pads to the running max of every window seen so far, so
    streaming windows converge to one stable compiled shape after the widest
    patch has been visited (a couple of recompiles at most — K widths are
    bounded by the K=23 cap)."""
    npstack = np.stack if not to_device else (lambda ms: jnp.asarray(np.stack(ms)))
    xs = npstack([np.asarray(a[0]) for a in arrays])
    gts = npstack([np.asarray(a[2]) for a in arrays])
    levels = len(arrays[0][1])

    def stack_padded(get, tag):
        out = []
        for lvl in range(levels):
            entries = [get(a)[lvl] for a in arrays]
            # per-level entries are pytrees (self-split mults are tuples);
            # pad 2-D leaves to the max per-patch K'/K_t width — extra zero
            # slots are inert (zero-row gather + zero multiplicity)
            treedef = jax.tree.structure(entries[0])
            leaf_rows = [jax.tree.leaves(e) for e in entries]
            stacked = []
            for li, parts in enumerate(zip(*leaf_rows)):
                mats = [np.asarray(p) for p in parts]
                if mats[0].ndim == 2:
                    # K-ish widths vary per patch on either axis (adj/adj_t/
                    # mult pad dim 1; node-minor mult_rows pad dim 0)
                    d0 = max(m.shape[0] for m in mats)
                    d1 = max(m.shape[1] for m in mats)
                    if width_state is not None:
                        key = (tag, lvl, li)
                        p0, p1 = width_state.get(key, (0, 0))
                        d0, d1 = max(d0, p0), max(d1, p1)
                        width_state[key] = (d0, d1)
                    mats = [
                        np.pad(m, ((0, d0 - m.shape[0]), (0, d1 - m.shape[1])))
                        for m in mats
                    ]
                stacked.append(npstack(mats))
            out.append(jax.tree.unflatten(treedef, stacked))
        return tuple(out)

    adjs = stack_padded(lambda a: a[1], "adj")
    adj_ts = stack_padded(lambda a: a[3], "adj_t")
    mults = stack_padded(lambda a: a[4], "mult")
    return xs, adjs, gts, adj_ts, mults


def make_scanned_train_step(step_fn, steps_per_call: int):
    """Wrap a train step into a jitted lax.scan over ``steps_per_call``
    iterations with on-device patch selection.

    Dispatch latency dominates per-step time on tunnel-attached TPUs
    (~250ms/step host loop vs 27ms device); scanning amortizes it. The patch
    for each scanned step is picked by indexing stacked same-shape patch
    arrays with a host-presampled index — preserving the reference's
    random-patch-per-iteration semantics (train.py:558).
    """
    import jax

    @jax.jit
    def run(state, xs, adjs, gts, idxs, base_key, adj_ts, mults):
        # per-step keys derive INSIDE the dispatch: a host-side
        # jax.random.split per chunk is its own device round-trip on a
        # tunnel-attached TPU (~2 round-trips per chunk measured)
        keys = jax.random.split(base_key, steps_per_call)

        def body(state, sel):
            idx, key = sel
            take = lambda t: jnp.take(t, idx, axis=0)
            x = take(xs)
            adj = jax.tree.map(take, adjs)
            gt = take(gts)
            a_ts = jax.tree.map(take, adj_ts)
            ms = jax.tree.map(take, mults)
            state, loss = step_fn(state, x, adj, gt, key, a_ts, ms)
            return state, loss

        return jax.lax.scan(body, state, (idxs, keys))

    return run


def train_normals(
    cfg: Config,
    train_set: MeshDataset,
    valid_set: Optional[MeshDataset] = None,
    num_iterations: Optional[int] = None,
    bucket_align: int = 1024,
    log_every: Optional[int] = None,
    steps_per_call: int = 1,
) -> Tuple[TrainState, np.ndarray]:
    """Normals-supervised training loop (reference ``trainNet``,
    train.py:380-632): random patch per step, smoothed train loss, periodic
    validation sweep, periodic checkpointing with NaN abort, loss history CSV.
    """
    iters = num_iterations or cfg.train.num_iterations
    log_every = log_every or cfg.train.eval_every
    key = jax.random.PRNGKey(cfg.train.seed)
    state, tx = create_train_state(key, cfg, num_steps=iters)
    step_fn = make_normals_train_step(tx, cfg)
    eval_fn = make_normals_eval_step(cfg)

    ckpt = CheckpointManager(cfg.train.network_path, cfg.train.net_name)
    state, start_step = ckpt.restore(state)

    patches = [_bucketed(p, bucket_align) for p in train_set.patches]
    if steps_per_call > 1:
        # scanned selection stacks patches: unify to the largest bucket
        target = max(p.num_nodes for p in patches)
        patches = [pad_patch_to(p, target) for p in patches]
    valid_patches = (
        [_bucketed(p, bucket_align) for p in valid_set.patches] if valid_set else []
    )
    # scanned selection picks each step's tables from stacked arrays inside
    # the scan body — use the pre-derived lane form so the body stays
    # take-only (graph.convert.lane_tables_pre); single-dispatch steps keep
    # the plain lane form (tables are closure constants, XLA hoists)
    lane_mode = "pre" if steps_per_call > 1 else True
    arrays = [_patch_arrays(p, lane=lane_mode) for p in patches]
    valid_arrays = [_patch_arrays(p) for p in valid_patches]

    rng = np.random.default_rng(cfg.train.seed)
    loss_hist: List[Tuple[float, float]] = []
    smooth_loss, smooth_n, last_valid = 0.0, 0, float("nan")
    t_start = time.time()

    if steps_per_call > 1:
        # scanned fast path: amortize dispatch latency over steps_per_call
        # steps, selecting the patch per step on-device
        stacked = _stack_patch_arrays(arrays)
        run = make_scanned_train_step(step_fn, steps_per_call)
        num_patches = len(arrays)
        # one split up front for every chunk's base key (as host numpy): the
        # in-loop host-side splits each cost a device round-trip over the
        # tunnel; per-step keys derive from the base key inside the dispatch
        num_chunks = (iters + steps_per_call - 1) // steps_per_call
        key, ckey = jax.random.split(key)
        chunk_keys = np.asarray(jax.random.split(ckey, max(num_chunks, 1)))
        it = 0
        ci = 0
        aborted = False
        pending = None  # (it_end, chunk, device losses, state) — consumed
        # one chunk late so chunk N+1 is enqueued before blocking on chunk
        # N's loss transfer (the transfer is the only per-chunk device sync;
        # deferring it double-buffers host bookkeeping with device compute)

        def consume(p):
            nonlocal last_valid, key, aborted
            p_it, p_chunk, p_losses, p_state = p
            avg = float(np.asarray(p_losses).mean())
            loss_hist.append((avg, last_valid))
            print(f"iter {p_it}: train loss {avg:.4f} "
                  f"({(time.time() - t_start):.1f}s)")
            if not np.isfinite(avg):
                print("NaN training loss — aborting")
                aborted = True
                return
            if p_it % cfg.train.save_every < p_chunk:
                ckpt.save(start_step + p_it, p_state)
            if valid_arrays and (p_it % cfg.train.valid_every) < p_chunk:
                vloss = 0.0
                for vx, vadjs, vgt, vts, vm in valid_arrays:
                    key, sub = jax.random.split(key)
                    vloss += float(
                        eval_fn(p_state.params, vx, vadjs, vgt, sub, vts, vm)
                    )
                last_valid = vloss / len(valid_arrays)

        while it < iters:
            chunk = min(steps_per_call, iters - it)
            idxs = jnp.asarray(rng.integers(num_patches, size=steps_per_call))
            base_key = jnp.asarray(chunk_keys[ci])
            ci += 1
            xs, s_adjs, gts, s_adj_ts, s_mults = stacked
            if chunk == steps_per_call:
                state, losses = run(state, xs, s_adjs, gts, idxs, base_key,
                                    s_adj_ts, s_mults)
            else:
                # remainder chunk: per-step execution so exactly
                # num_iterations optimizer updates are applied
                keys = jax.random.split(base_key, chunk)
                rem = []
                for j in range(chunk):
                    x, adjs, gt, adj_ts, mults = arrays[int(idxs[j])]
                    state, loss = step_fn(state, x, adjs, gt, keys[j],
                                          adj_ts, mults)
                    rem.append(float(loss))
                losses = np.asarray(rem)
            it += chunk
            if pending is not None:
                consume(pending)
                if aborted:
                    pending = None
                    break
            pending = (it, chunk, losses, state)
        if pending is not None:
            consume(pending)
    else:
        aborted = False
        for it in range(iters):
            if it > 0 and it % cfg.train.save_every == 0:
                if not np.isfinite(float(smooth_loss)):
                    print("NaN training loss — aborting at checkpoint")
                    aborted = True
                    break
                ckpt.save(start_step + it, state)
            idx = int(rng.integers(len(arrays)))
            x, adjs, gt, adj_ts, mults = arrays[idx]
            key, sub = jax.random.split(key)
            state, loss = step_fn(state, x, adjs, gt, sub, adj_ts, mults)
            smooth_loss += float(loss)
            smooth_n += 1
            if it % log_every == 0:
                avg = smooth_loss / max(smooth_n, 1)
                print(f"iter {it}: train loss {avg:.4f} "
                      f"({(time.time() - t_start):.1f}s)")
                loss_hist.append((avg, last_valid))
                smooth_loss, smooth_n = 0.0, 0
            if valid_arrays and it % cfg.train.valid_every == 0:
                vloss = 0.0
                for vx, vadjs, vgt, vts, vm in valid_arrays:
                    key, sub = jax.random.split(key)
                    vloss += float(
                        eval_fn(state.params, vx, vadjs, vgt, sub, vts, vm)
                    )
                last_valid = vloss / len(valid_arrays)
                print(f"iter {it}: validation loss {last_valid:.4f}")

    if not aborted:
        # a NaN abort leaves ``state`` poisoned (and, on the scanned path,
        # advanced past the NaN chunk) — never persist it as the final ckpt
        ckpt.save(start_step + iters, state)
    ckpt.close()
    hist = np.asarray(loss_hist, dtype=np.float64)
    csv_path = os.path.join(cfg.train.network_path, cfg.train.net_name + ".csv")
    os.makedirs(cfg.train.network_path, exist_ok=True)
    with open(csv_path, "ab") as fh:
        np.savetxt(fh, hist, delimiter=",")
    return state, hist


def make_windowed_train_step(step_fn):
    """Scan a train step over a window of DEVICE-RESIDENT prepared patches —
    ONE dispatch per window. ``items`` is a tuple of per-patch array tuples
    (same shapes); they are stacked ON DEVICE (HBM-speed copy, no re-upload)
    and scanned, giving the streaming path the in-memory scanned trainer's
    wall clock once each distinct patch has been uploaded once."""

    @jax.jit
    def run(state, items, base_key):
        xs, adjs, gts, adj_ts, mults = jax.tree.map(
            lambda *ts: jnp.stack(ts), *items
        )
        # per-step keys derive in-dispatch (host-side splits round-trip the
        # tunnel); len(items) is static per compiled window shape
        keys = jax.random.split(base_key, len(items))

        def body(state, sel):
            x, adj, gt, a_t, m, key = sel
            return step_fn(state, x, adj, gt, key, a_t, m)

        return jax.lax.scan(body, state, (xs, adjs, gts, adj_ts, mults, keys))

    return run


def _leaf_dims(arrays):
    """2-D leaf shapes of a prepared-patch tuple, in flatten order."""
    return [np.asarray(l).shape for l in jax.tree.leaves(arrays)
            if np.asarray(l).ndim == 2]


def _pad_to_dims(arrays, dims):
    """Zero-pad every 2-D leaf to the given running-max dims (extra zero
    slots are inert: zero-row gather + zero multiplicity)."""
    leaves, treedef = jax.tree.flatten(arrays)
    out, di = [], 0
    for l in leaves:
        m = np.asarray(l)
        if m.ndim == 2:
            d0, d1 = dims[di]
            di += 1
            m = np.pad(m, ((0, d0 - m.shape[0]), (0, d1 - m.shape[1])))
        out.append(m)
    return jax.tree.unflatten(treedef, out)


def train_normals_streaming(
    cfg: Config,
    shard_dir: str,
    valid_set: Optional[MeshDataset] = None,
    num_iterations: Optional[int] = None,
    bucket_align: int = 1024,
    prefetch_depth: int = 2,
    steps_per_call: int = 1,
) -> Tuple[TrainState, np.ndarray]:
    """Normals training from a sharded on-disk dataset with host-overlap
    prefetch (data/stream.py): patches load lazily from npz shards, graph
    prep + H2D staging run on a background thread, and the device consumes
    a double-buffered queue — the scale-out replacement for loading the
    whole pickled set up front (reference train.py:1901-1906).

    ``steps_per_call > 1`` turns on the windowed scan path: the loader
    thread stacks windows of prepared patches (every patch padded to the
    dataset-wide bucket so windows share ONE compiled shape; K-widths are
    made monotone by ``_stack_patch_arrays(width_state=…)``) and stages each
    window to the device while the previous window trains; the consumer runs
    the whole window in one ``lax.scan`` dispatch."""
    from facet_graph_convolution_tpu.data.stream import (
        PrefetchLoader,
        ShardedDataset,
    )

    iters = num_iterations or cfg.train.num_iterations
    key = jax.random.PRNGKey(cfg.train.seed)
    state, tx = create_train_state(key, cfg, num_steps=iters)
    step_fn = make_normals_train_step(tx, cfg)
    ckpt = CheckpointManager(cfg.train.network_path, cfg.train.net_name)
    state, start_step = ckpt.restore(state)

    ds = ShardedDataset(shard_dir)
    windowed = steps_per_call > 1

    # memoize the per-patch graph compile: prep (dedupe, transpose maps,
    # fused rows, H2D) runs once per patch, not once per draw
    import collections as _collections

    prepared: "_collections.OrderedDict" = _collections.OrderedDict()
    max_prepared = 64

    if windowed:
        # one dataset-wide bucket so every window compiles to one shape;
        # K-ish widths are running maxima — a width growth bumps `version`
        # and stale device copies re-pad + re-upload once
        target = bucket_size(ds.max_num_nodes, bucket_align)
        dims: List = []
        version = [0]
        dev_memo: "_collections.OrderedDict" = _collections.OrderedDict()

        def prepare(patch, idx):
            if idx not in prepared:
                prepared[idx] = _patch_arrays(pad_patch_to(patch, target),
                                              lane="pre", to_device=False)
                while len(prepared) > max_prepared:
                    prepared.popitem(last=False)
            else:
                prepared.move_to_end(idx)
            grew = False
            for di, shp in enumerate(_leaf_dims(prepared[idx])):
                if di == len(dims):
                    dims.append(shp)
                    grew = True
                elif shp[0] > dims[di][0] or shp[1] > dims[di][1]:
                    dims[di] = (max(shp[0], dims[di][0]),
                                max(shp[1], dims[di][1]))
                    grew = True
            if grew:
                version[0] += 1
            return idx

        def collate(idxs):
            # upload each patch's padded arrays ONCE (loader thread, async
            # H2D overlaps the previous window's device execution); windows
            # then reference device-resident arrays
            items = []
            for idx in idxs:
                v, dev = dev_memo.get(idx, (-1, None))
                if v != version[0]:
                    if idx not in prepared:
                        # host copy evicted since prepare(): rebuild (rare —
                        # only when a width bump outlives the host LRU)
                        prepared[idx] = _patch_arrays(
                            pad_patch_to(ds.patch(idx), target),
                            lane="pre", to_device=False,
                        )
                    dev = jax.device_put(_pad_to_dims(prepared[idx], dims))
                    dev_memo[idx] = (version[0], dev)
                    while len(dev_memo) > max_prepared:
                        dev_memo.popitem(last=False)
                else:
                    dev_memo.move_to_end(idx)
                items.append(dev)
            return tuple(items)
    else:
        collate = None

        def prepare(patch, idx):
            # keyed by the global patch index — patch OBJECTS are re-created
            # when the shard LRU evicts and reloads, and a freed object's
            # id() can be reused, so identity is not a safe key
            if idx in prepared:
                prepared.move_to_end(idx)
                return prepared[idx]
            arrays = _patch_arrays(_bucketed(patch, bucket_align))
            prepared[idx] = arrays
            while len(prepared) > max_prepared:
                prepared.popitem(last=False)
            return arrays

    valid_arrays = []
    if valid_set is not None:
        eval_fn = make_normals_eval_step(cfg)
        valid_arrays = [
            _patch_arrays(_bucketed(p, bucket_align))
            for p in valid_set.patches
        ]
    loader = PrefetchLoader(
        ds, prepare, seed=cfg.train.seed, depth=prefetch_depth,
        num_items=iters,
        window=steps_per_call if windowed else None,
        collate=collate,
    )
    run_window = make_windowed_train_step(step_fn) if windowed else None
    loss_hist: List[Tuple[float, float]] = []
    smooth_loss, smooth_n, last_valid = 0.0, 0, float("nan")
    t_start = time.time()
    aborted = False
    if windowed:
        # presplit every window's base key once (host numpy) — in-loop
        # host-side splits round-trip the tunnel; per-step keys derive from
        # the base key inside the window dispatch
        num_windows = (iters + steps_per_call - 1) // steps_per_call
        key, wkey = jax.random.split(key)
        window_keys = np.asarray(jax.random.split(wkey, max(num_windows, 1)))
        wi = 0

    def validate(key):
        vloss = 0.0
        for vx, vadjs, vgt, vts, vm in valid_arrays:
            key, sub = jax.random.split(key)
            vloss += float(eval_fn(state.params, vx, vadjs, vgt, sub, vts, vm))
        return vloss / len(valid_arrays), key

    try:
        it = 0
        for item in loader:
            if windowed:
                items, count = item
                base_key = jnp.asarray(window_keys[wi])
                wi += 1
                if count == steps_per_call:
                    state, losses = run_window(state, items, base_key)
                    losses = np.asarray(losses)
                else:
                    # final partial window: per-step on its items
                    keys = jax.random.split(base_key, count)
                    rem = []
                    for j in range(count):
                        x, adj, gt, a_t, m = items[j]
                        state, loss = step_fn(state, x, adj, gt, keys[j],
                                              a_t, m)
                        rem.append(float(loss))
                    losses = np.asarray(rem)
                it += count
                smooth_loss += float(losses.sum())
                smooth_n += count
            else:
                x, adjs, gt, adj_ts, mults = item
                key, sub = jax.random.split(key)
                state, loss = step_fn(state, x, adjs, gt, sub, adj_ts, mults)
                it += 1
                smooth_loss += float(loss)
                smooth_n += 1
            stride = steps_per_call if windowed else 1
            if valid_arrays and it % cfg.train.valid_every < stride:
                last_valid, key = validate(key)
            if it % cfg.train.eval_every < stride:
                avg = smooth_loss / max(smooth_n, 1)
                loss_hist.append((avg, last_valid))
                print(f"iter {it}: train loss {avg:.4f} "
                      f"({time.time() - t_start:.1f}s)")
                if not np.isfinite(avg):
                    print("NaN training loss — aborting")
                    aborted = True
                    break
                smooth_loss, smooth_n = 0.0, 0
            if it > 0 and it % cfg.train.save_every < stride:
                ckpt.save(start_step + it, state)
    finally:
        loader.close()
    if not aborted:
        ckpt.save(start_step + iters, state)
    ckpt.close()
    # same artifact contract as train_normals: (train, valid) history rows
    # appended to <network_path>/<net_name>.csv (reference train.py:629-632)
    hist = np.asarray(loss_hist, dtype=np.float64)
    os.makedirs(cfg.train.network_path, exist_ok=True)
    csv_path = os.path.join(cfg.train.network_path, cfg.train.net_name + ".csv")
    with open(csv_path, "ab") as fh:
        np.savetxt(fh, hist, delimiter=",")
    return state, hist


# ---------------------------------------------------------------------------
# Vertex-supervised step (reference trainAccuracyNet / trainDoubleLossNet):
# multiScale forward → in-graph multi-scale vertex solver → sampled chamfer
# against the GT point set, optionally + normal supervision.
# ---------------------------------------------------------------------------

def _solver_tables(cfg: Config, p: FacetPatch):
    """Static operator-solver tables for one vertex patch
    (ops.vertex_update.build_solver_tables)."""
    from facet_graph_convolution_tpu.ops.vertex_update import (
        build_solver_tables,
    )

    return build_solver_tables(
        p.v_faces,
        [a.shape[0] for a in p.adjs],
        p.vertices.shape[0],
        coarsening_steps=cfg.model.coarsening_steps,
        faces=p.faces,
    )


def make_vertex_train_step(
    tx: optax.GradientTransformation,
    cfg: Config,
    normals_weight: float = 0.0,
):
    """(state, patch arrays, key) → (state, loss). ``normals_weight > 0``
    adds the angular term, giving the reference's double-loss trainer
    (train.py:919-1267).

    The returned step carries:
    - ``step.eval(params, …)`` — loss only, NO backward (the reference
      evaluates its validation loss without a train op too,
      train.py:859-888; running the full step and discarding the update
      pays forward AND backward through the 120-iteration solver);
    - ``step.scanned(state, args, keys [W])`` — W steps on ONE patch in a
      single jitted ``lax.scan`` dispatch (dispatch latency dominates
      per-step time on tunnel-attached TPUs; the patch arrays stay
      loop-invariant jit operands, same strategy as the chunk-DP runner).
    """
    steps = cfg.model.coarsening_steps
    samples = cfg.train.chamfer_samples
    iter_nums = cfg.eval.ms_solver_iterations
    solver_remat = cfg.eval.solver_remat
    variant = _config_variant(cfg)
    alpha = cfg.model.lrelu_alpha

    def _loss(params, x, adjs, vertices, gt_vertices, faces, v_faces,
              gt_normals, key, adj_ts, mults, solver_tables=None):
        rot_key, s0_key, s1_key = jax.random.split(key, 3)
        rot = random_rotation(rot_key)
        x_rot = rotate_inputs(rot, x)
        v_rot = rotate_vec3(rot, vertices)
        gtv_rot = rotate_vec3(rot, gt_vertices)
        idx0 = jax.random.randint(s0_key, (samples,), 0, vertices.shape[0])
        idx1 = jax.random.randint(s1_key, (samples,), 0, gt_vertices.shape[0])

        y0, y1, y2 = _apply_model(
            params, x_rot, adjs, adj_ts, mults, steps=steps,
            variant=variant, alpha=alpha, multi_scale=True,
        )
        n0 = normalize_tensor(y0)
        n1 = normalize_tensor(y1)
        n2 = normalize_tensor(y2)
        if solver_tables is not None:
            # deduped linear-operator solver body (exact; scatter-free both
            # directions — BASELINE.md round-4 vertex ladder)
            from facet_graph_convolution_tpu.ops.vertex_update import (
                update_positions_multiscale_operator,
            )

            refined, _ = update_positions_multiscale_operator(
                v_rot, [n0, n1, n2], faces, v_faces, solver_tables,
                coarsening_steps=steps, iter_nums=iter_nums,
                checkpoint=solver_remat,
            )
        else:
            refined, _ = update_positions_multiscale(
                v_rot, [n0, n1, n2], faces, v_faces,
                coarsening_steps=steps, iter_nums=iter_nums,
                checkpoint=solver_remat,
            )
        loss = full_chamfer_loss(refined, gtv_rot, idx0, idx1)
        if normals_weight > 0 and gt_normals is not None:
            gtn_rot = rotate_vec3(rot, gt_normals)
            loss = loss + normals_weight * face_normals_loss(n0, gtn_rot)
        return loss

    def _update(state, loss, grads):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def step(state, x, adjs, vertices, gt_vertices, faces, v_faces,
             gt_normals, key, adj_ts=None, mults=None, solver_tables=None):
        loss, grads = jax.value_and_grad(_loss)(
            state.params, x, adjs, vertices, gt_vertices, faces, v_faces,
            gt_normals, key, adj_ts, mults, solver_tables,
        )
        return _update(state, loss, grads)

    @jax.jit
    def scanned(state, args, keys):
        (x, adjs, vertices, gt_vertices, faces, v_faces, gt_normals,
         adj_ts, mults), solver_tables = args[:9], (
            args[9] if len(args) > 9 else None)

        def body(state, key):
            loss, grads = jax.value_and_grad(_loss)(
                state.params, x, adjs, vertices, gt_vertices, faces,
                v_faces, gt_normals, key, adj_ts, mults, solver_tables,
            )
            return _update(state, loss, grads)

        return jax.lax.scan(body, state, keys)

    step_jit = jax.jit(step)
    step_jit.eval = jax.jit(  # type: ignore[attr-defined]
        lambda params, x, adjs, vertices, gt_vertices, faces, v_faces,
               gt_normals, key, adj_ts=None, mults=None, solver_tables=None:
        _loss(
            params, x, adjs, vertices, gt_vertices, faces, v_faces,
            gt_normals, key, adj_ts, mults, solver_tables,
        )
    )
    step_jit.scanned = scanned  # type: ignore[attr-defined]
    return step_jit


def train_with_vertices(
    cfg: Config,
    train_set: MeshDataset,
    valid_set: Optional[MeshDataset] = None,
    num_iterations: Optional[int] = None,
    normals_weight: float = 0.0,
    steps_per_call: int = 1,
    log_every: int = 10,
) -> Tuple[TrainState, np.ndarray]:
    """End-to-end vertex training (reference ``trainAccuracyNet``,
    train.py:636-914): gradients flow from the chamfer loss through the
    120-iteration vertex solver into the U-Net.

    Driver contract matches ``train_normals``: Orbax checkpoint/resume, NaN
    abort (skipping the final save of a poisoned state), eval-only
    validation, and the ``<network_path>/<net_name>.csv`` loss-history
    artifact (reference writes one too, train.py:899-904).

    ``steps_per_call > 1`` runs chunks of steps in ONE jitted ``lax.scan``
    dispatch with the patch pinned per chunk (patches rotate at chunk
    boundaries — vertex patches have per-patch V/N shapes, so they cannot be
    stacked for in-scan selection; pinning also keeps the arrays
    loop-invariant, which is the faster regime anyway, see chunk-DP)."""
    iters = num_iterations or cfg.train.num_iterations
    key = jax.random.PRNGKey(cfg.train.seed)
    state, tx = create_train_state(key, cfg, multi_scale=True, num_steps=iters)
    step_fn = make_vertex_train_step(tx, cfg, normals_weight=normals_weight)

    ckpt = CheckpointManager(cfg.train.network_path, cfg.train.net_name)
    state, start_step = ckpt.restore(state)

    def vertex_args(p):
        adjs, adj_ts, mults = _graph_arrays(p.adjs)
        return (
            jnp.asarray(p.inputs),
            adjs,
            jnp.asarray(p.vertices),
            jnp.asarray(p.gt_vertices),
            jnp.asarray(p.faces),
            jnp.asarray(p.v_faces),
            None if p.gt_normals is None else jnp.asarray(p.gt_normals),
            adj_ts,
            mults,
        ) + ((_solver_tables(cfg, p),)
             if cfg.eval.vertex_solver == "operator" else ())

    arrays = [vertex_args(p) for p in train_set.patches]
    valid_args = (
        [vertex_args(p) for p in valid_set.patches] if valid_set is not None else []
    )

    def validate(state, key):
        # eval-only jit: forward + solver + chamfer, no backward (the
        # reference evaluates customLoss without the train op, train.py:859)
        vloss = 0.0
        for vargs in valid_args:
            key, sub = jax.random.split(key)
            vx, vadjs, vv, vgtv, vf, vvf, vgtn, vts, vm = vargs[:9]
            vst = vargs[9] if len(vargs) > 9 else None
            vloss += float(step_fn.eval(state.params, vx, vadjs, vv, vgtv,
                                        vf, vvf, vgtn, sub, vts, vm, vst))
        return vloss / len(valid_args), key

    rng = np.random.default_rng(cfg.train.seed)
    loss_hist: List[Tuple[float, float]] = []
    last_valid = float("nan")
    aborted = False
    t_start = time.time()
    save_every = min(cfg.train.save_every, 500)   # reference uses 500 here
    if steps_per_call > 1:
        it = 0
        while it < iters and not aborted:
            chunk = min(steps_per_call, iters - it)
            idx = int(rng.integers(len(arrays)))
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, chunk)
            if chunk == steps_per_call:
                state, losses = step_fn.scanned(state, arrays[idx], keys)
                losses = np.asarray(losses)
            else:
                x, adjs, v, gtv, faces, v_faces, gtn, adj_ts, mults = arrays[idx][:9]
                stbl = arrays[idx][9] if len(arrays[idx]) > 9 else None
                rem = []
                for j in range(chunk):
                    state, loss = step_fn(state, x, adjs, v, gtv, faces,
                                          v_faces, gtn, keys[j], adj_ts,
                                          mults, stbl)
                    rem.append(float(loss))
                losses = np.asarray(rem)
            it += chunk
            avg = float(losses.mean())
            if valid_args and (it % cfg.train.valid_every) < chunk:
                last_valid, key = validate(state, key)
            loss_hist.append((avg, last_valid))
            print(f"iter {it}: vertex loss {avg:.4f} "
                  f"({time.time() - t_start:.1f}s)")
            if not np.isfinite(avg):
                print("NaN training loss — aborting")
                aborted = True
                break
            if it % save_every < chunk:
                ckpt.save(start_step + it, state)
    else:
        for it in range(iters):
            if it > 0 and it % save_every == 0:
                if loss_hist and not np.isfinite(loss_hist[-1][0]):
                    print("NaN training loss — aborting at checkpoint")
                    aborted = True
                    break
                ckpt.save(start_step + it, state)
            idx = int(rng.integers(len(arrays)))
            x, adjs, v, gtv, faces, v_faces, gtn, adj_ts, mults = arrays[idx][:9]
            stbl = arrays[idx][9] if len(arrays[idx]) > 9 else None
            key, sub = jax.random.split(key)
            state, loss = step_fn(state, x, adjs, v, gtv, faces, v_faces, gtn,
                                  sub, adj_ts, mults, stbl)
            if valid_args and it % cfg.train.valid_every == 0:
                last_valid, key = validate(state, key)
                print(f"iter {it}: validation loss {last_valid:.4f}")
            loss_hist.append((float(loss), last_valid))
            if it % log_every == 0:
                print(f"iter {it}: loss {float(loss):.4f} "
                      f"({time.time() - t_start:.1f}s)")
            if not np.isfinite(float(loss)):
                print("NaN training loss — aborting")
                aborted = True
                break

    if not aborted:
        ckpt.save(start_step + iters, state)
    ckpt.close()
    hist = np.asarray(loss_hist, dtype=np.float64)
    # same artifact contract as train_normals (reference train.py:899-904)
    os.makedirs(cfg.train.network_path, exist_ok=True)
    csv_path = os.path.join(cfg.train.network_path, cfg.train.net_name + ".csv")
    with open(csv_path, "ab") as fh:
        np.savetxt(fh, hist, delimiter=",")
    return state, hist
