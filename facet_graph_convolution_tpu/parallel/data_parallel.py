"""Patch-batch data parallelism.

The reference trains one patch per step on one device (train.py:404-405,
558). Here each device on the ``data`` mesh axis trains one bucket-padded
patch per step and gradients are pmean-reduced — standard DP via
``shard_map``, running the SAME single-chip fast path as the trainer
(dedup + self-split + node-minor + lane gather + bf16,
training/trainer._graph_arrays / BASELINE.md ladder), so per-chip throughput
matches the single-chip step.

Data flow: the whole bucket-unified patch set is staged ON DEVICE once as a
stacked "bank" ([P, ...] arrays, replicated across the DP axis), and each
step selects its per-device patch by index inside the compiled program —
no per-step host→device upload, and steps can be chained inside one
``lax.scan`` dispatch (make_dp_scanned_step) exactly like the single-chip
scanned trainer.
"""

from __future__ import annotations

import math
import os
import time
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from facet_graph_convolution_tpu.config import Config
from facet_graph_convolution_tpu.data.dataset import FacetPatch, pad_patch_to
from facet_graph_convolution_tpu.models.augment import (
    random_rotation,
    rotate_inputs,
    rotate_vec3,
)
from facet_graph_convolution_tpu.models.losses import face_normals_loss
from facet_graph_convolution_tpu.ops.normalization import normalize_tensor
from facet_graph_convolution_tpu.training.trainer import TrainState


def stack_patches(patches: Sequence[FacetPatch], target: int):
    """Pad each patch to ``target`` fine nodes and stack into batch arrays:
    (x [B,N,C], adjs tuple of [B,N_l,K], gt [B,N,3]). Raw K-list form — the
    fast-path bank is built by :func:`build_patch_bank` instead."""
    padded = [pad_patch_to(p, target) for p in patches]
    x = np.stack([p.inputs for p in padded])
    levels = len(padded[0].adjs)
    adjs = tuple(
        np.stack([p.adjs[lvl] for p in padded]) for lvl in range(levels)
    )
    gt = np.stack([p.gt_normals for p in padded])
    return x, adjs, gt


def build_patch_bank(patches: Sequence[FacetPatch], cfg: Config):
    """Stage the patch set as stacked fast-path arrays: every patch is padded
    to the common bucket and compiled through the single-chip graph
    optimizations (``_patch_arrays``: dedupe, self-split, node-minor fused
    rows, lane tables), then stacked with per-level K-width padding
    (``_stack_patch_arrays``). Returns (xs, adjs, gts, adj_ts, mults)."""
    from facet_graph_convolution_tpu.training.trainer import (
        _patch_arrays,
        _stack_patch_arrays,
    )

    group = (2 ** cfg.model.coarsening_steps) ** (cfg.model.coarsening_levels - 1)
    target = max(p.num_nodes for p in patches)
    # bucket to a LANE-ALIGNED size (lcm of 1024 and the coarsening group):
    # a group-only multiple leaves every [*, N] node-minor array ragged
    # against the TPU's (8, 128) tiling — measured 68.4 vs 84.5M edges/s/chip
    # on the bench patch (25200 vs 25600 nodes)
    align = 1024 * group // math.gcd(1024, group)
    target = ((target + align - 1) // align) * align
    padded = [pad_patch_to(p, target) for p in patches]
    # pre-derived lane tables: the per-device patch is selected INSIDE the
    # compiled step, so the clamp/mask/gate index math must be staged in the
    # bank, not re-derived per step (graph.convert.lane_tables_pre — closes
    # the measured ~2.6 ms/step DP gap, BASELINE.md)
    arrays = [_patch_arrays(p, lane="pre") for p in padded]
    return _stack_patch_arrays(arrays)


def make_dp_train_step(
    tx: optax.GradientTransformation,
    cfg: Config,
    mesh: Mesh,
    axis: str = "data",
):
    """Jitted DP step over a staged patch bank:

    ``step(state, bank, idx [B], keys [B]) → (state, mean loss)``

    ``bank`` = :func:`build_patch_bank` output (replicated across the DP
    axis); ``idx`` holds one patch index per device (B = ``data`` axis
    size); each device runs the full single-chip fast path on its selected
    patch and gradients are pmean-reduced."""
    from facet_graph_convolution_tpu.training.trainer import (
        _apply_model,
        _config_variant,
    )

    steps = cfg.model.coarsening_steps
    loss_samples = cfg.train.loss_samples
    augment = cfg.train.augment_rotations
    compute_dtype = (
        jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else None
    )
    variant = _config_variant(cfg)
    alpha = cfg.model.lrelu_alpha

    def per_patch_loss(params, x, adjs, adj_ts, mults, gt, key):
        rot_key, samp_key = jax.random.split(key)
        if augment:
            rot = random_rotation(rot_key)
            x = rotate_inputs(rot, x)
            gt = rotate_vec3(rot, gt)
        sample_idx = jax.random.randint(samp_key, (loss_samples,), 0, x.shape[0])
        y = _apply_model(
            params, x, adjs, adj_ts, mults, steps=steps, variant=variant,
            alpha=alpha, compute_dtype=compute_dtype,
        )
        y = normalize_tensor(y)
        return face_normals_loss(
            jnp.take(y, sample_idx, axis=0), jnp.take(gt, sample_idx, axis=0)
        )

    def sharded_grads_fn(params, bank, idx, keys):
        xs, adjs, gts, adj_ts, mults = bank

        def body(params, xs, adjs, gts, adj_ts, mults, idx, keys):
            take = lambda t: jnp.take(t, idx[0], axis=0)
            loss, grads = jax.value_and_grad(per_patch_loss)(
                params,
                take(xs),
                jax.tree.map(take, adjs),
                jax.tree.map(take, adj_ts),
                jax.tree.map(take, mults),
                take(gts),
                keys[0],
            )
            return jax.lax.pmean(loss, axis), jax.lax.pmean(grads, axis)

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), jax.tree.map(lambda _: P(), xs),
                      jax.tree.map(lambda _: P(), adjs),
                      jax.tree.map(lambda _: P(), gts),
                      jax.tree.map(lambda _: P(), adj_ts),
                      jax.tree.map(lambda _: P(), mults),
                      P(axis), P(axis)),
            out_specs=(P(), P()),
        )(params, xs, adjs, gts, adj_ts, mults, idx, keys)

    @jax.jit
    def _step(state: TrainState, bank, idx, keys):
        loss, grads = sharded_grads_fn(state.params, bank, idx, keys)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    @jax.jit
    def eval_step(params, bank, idx, keys):
        loss, _ = sharded_grads_fn(params, bank, idx, keys)
        return loss

    def step(state: TrainState, bank, idx, keys):
        return _step(state, bank, idx, keys)

    step.eval = eval_step  # type: ignore[attr-defined]
    return step


def make_dp_scanned_step(step_fn):
    """Scan a DP step over ``[steps, B]`` index/key batches in ONE dispatch —
    the DP counterpart of the single-chip scanned trainer (dispatch latency
    dominates per-step time on tunnel-attached TPUs).

    Per-STEP patch selection: statistically identical to the reference's
    random-patch-per-iteration loop (train.py:558), but the in-scan bank
    selection makes every graph table loop-variant, which defeats XLA's
    VMEM pinning + prefetch scheduling of loop-invariant operands — a
    measured constant ~3 ms/step (≈20% at the 20k-face bench patch; the
    pre-derived tables and a scan-xs pre-selection variant were both
    measured and do NOT recover it, BASELINE.md). For full per-chip
    throughput use :func:`make_dp_chunk_runner`."""

    @jax.jit
    def run(state, bank, idxs, keys):
        def body(state, sel):
            idx, key = sel
            state, loss = step_fn(state, bank, idx, key)
            return state, loss

        return jax.lax.scan(body, state, (idxs, keys))

    return run


def make_dp_chunk_runner(
    tx: optax.GradientTransformation,
    cfg: Config,
    mesh: Mesh,
    axis: str = "data",
):
    """Chunked DP: each device trains ONE fixed patch for a whole scanned
    chunk; patches rotate across chunks (driver-side reshuffle).

    Because the per-device graph tables enter the compiled program as jit
    OPERANDS — loop-invariant across the chunk's ``lax.scan`` — XLA hoists,
    VMEM-pins, and prefetches them exactly as in the plain single-chip step,
    recovering full per-chip throughput (the per-step bank selection costs a
    measured constant ~3 ms/step — see make_dp_scanned_step). The tradeoff
    is sampling granularity: patches reshuffle every chunk instead of every
    step, preserving the reference's random-patch semantics at chunk
    boundaries (train.py:558 samples per iteration; with B devices × W-step
    chunks each optimizer step still averages B patches).

    Returns ``(select, run)``:
      - ``select(bank, idx [B]) → sel``: one jitted gather staging each
        device's patch operands from the replicated bank;
      - ``run(state, sel, keys [W, B]) → (state, losses [W])``: the scanned
        chunk (shard_map over the data axis; pmean-reduced grads).
    """
    from facet_graph_convolution_tpu.training.trainer import (
        _apply_model,
        _config_variant,
    )

    steps = cfg.model.coarsening_steps
    loss_samples = cfg.train.loss_samples
    augment = cfg.train.augment_rotations
    compute_dtype = (
        jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else None
    )
    variant = _config_variant(cfg)
    alpha = cfg.model.lrelu_alpha

    def per_patch_loss(params, x, adjs, adj_ts, mults, gt, key):
        rot_key, samp_key = jax.random.split(key)
        if augment:
            rot = random_rotation(rot_key)
            x = rotate_inputs(rot, x)
            gt = rotate_vec3(rot, gt)
        sample_idx = jax.random.randint(samp_key, (loss_samples,), 0, x.shape[0])
        y = _apply_model(
            params, x, adjs, adj_ts, mults, steps=steps, variant=variant,
            alpha=alpha, compute_dtype=compute_dtype,
        )
        y = normalize_tensor(y)
        return face_normals_loss(
            jnp.take(y, sample_idx, axis=0), jnp.take(gt, sample_idx, axis=0)
        )

    @jax.jit
    def select(bank, idx):
        return jax.tree.map(lambda t: jnp.take(t, idx, axis=0), bank)

    @jax.jit
    def run(state, sel, keys):
        xs, adjs, gts, adj_ts, mults = sel

        def shard_body(params_and_opt, xs, adjs, gts, adj_ts, mults, keys):
            # leading [1] batch dim on this shard's operands: drop it so the
            # per-patch program is byte-identical to the single-chip step
            sq = lambda t: t[0]
            x, gt = sq(xs), sq(gts)
            a = jax.tree.map(sq, adjs)
            a_t = jax.tree.map(sq, adj_ts)
            m = jax.tree.map(sq, mults)

            def body(state, key):
                loss, grads = jax.value_and_grad(per_patch_loss)(
                    state.params, x, a, a_t, m, gt, key
                )
                grads = jax.lax.pmean(grads, axis)
                updates, opt_state = tx.update(grads, state.opt_state,
                                               state.params)
                params = optax.apply_updates(state.params, updates)
                return (
                    TrainState(params, opt_state, state.step + 1),
                    jax.lax.pmean(loss, axis),
                )

            return jax.lax.scan(body, params_and_opt, keys[:, 0])

        return jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(), jax.tree.map(lambda _: P(axis), xs),
                      jax.tree.map(lambda _: P(axis), adjs),
                      jax.tree.map(lambda _: P(axis), gts),
                      jax.tree.map(lambda _: P(axis), adj_ts),
                      jax.tree.map(lambda _: P(axis), mults),
                      P(None, axis)),
            out_specs=(P(), P()),
        )(state, xs, adjs, gts, adj_ts, mults, keys)

    return select, run


def train_normals_dp(
    cfg: Config,
    train_set,
    mesh: Mesh,
    valid_set=None,
    num_iterations: Optional[int] = None,
    log_every: int = 50,
    steps_per_call: int = 1,
    checkpoint: bool = False,
    selection: str = "chunk",
):
    """Data-parallel training driver (the multi-patch generalization of the
    reference's one-patch-per-step loop, train.py:549-624): every step
    samples one patch per device along the ``data`` axis; full driver
    contract (checkpoint/resume, validation sweep, loss CSV, NaN abort) as
    the single-chip ``train_normals``.

    ``selection`` (scanned path only, ``steps_per_call > 1``): ``"chunk"``
    (default) pins each device to one patch per scanned chunk and reshuffles
    at chunk boundaries — full per-chip throughput, tables loop-invariant
    (make_dp_chunk_runner); ``"step"`` samples a patch per device per STEP
    like the reference loop, paying a measured constant ~3 ms/step for the
    in-scan bank selection (make_dp_scanned_step)."""
    from facet_graph_convolution_tpu.training.checkpoint import CheckpointManager
    from facet_graph_convolution_tpu.training.trainer import create_train_state

    axis = cfg.shard.data_axis
    batch = mesh.shape[axis]
    iters = num_iterations or cfg.train.num_iterations

    key = jax.random.PRNGKey(cfg.train.seed)
    state, tx = create_train_state(key, cfg, num_steps=iters)
    step_fn = make_dp_train_step(tx, cfg, mesh, axis=axis)

    ckpt = CheckpointManager(cfg.train.network_path, cfg.train.net_name) if checkpoint else None
    start_step = 0
    if ckpt is not None:
        state, start_step = ckpt.restore(state)
        if start_step:
            # restored arrays land on one device; re-replicate over the mesh
            from jax.sharding import NamedSharding

            state = jax.device_put(state, NamedSharding(mesh, P()))

    bank = build_patch_bank(train_set.patches, cfg)
    bank = jax.tree.map(jnp.asarray, bank)
    num_patches = len(train_set.patches)
    valid_bank = None
    if valid_set is not None and valid_set.patches:
        valid_bank = jax.tree.map(
            jnp.asarray, build_patch_bank(valid_set.patches, cfg)
        )
        n_valid = len(valid_set.patches)

    rng = np.random.default_rng(cfg.train.seed)
    loss_hist: List[Tuple[float, float]] = []
    losses: List[float] = []
    last_valid = float("nan")
    aborted = False
    t_start = time.time()

    def validate(state, key):
        # sweep the valid patches in B-sized waves (wrap-around padding)
        total, waves = 0.0, 0
        for w0 in range(0, n_valid, batch):
            idx = np.asarray([(w0 + i) % n_valid for i in range(batch)])
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, batch)
            total += float(step_fn.eval(state.params, valid_bank,
                                        jnp.asarray(idx), keys))
            waves += 1
        return total / max(waves, 1), key

    with mesh:
        if steps_per_call > 1:
            if selection == "chunk":
                chunk_select, chunk_run = make_dp_chunk_runner(
                    tx, cfg, mesh, axis=axis
                )
            else:
                run = make_dp_scanned_step(step_fn)
            it = 0
            while it < iters:
                chunk = min(steps_per_call, iters - it)
                idxs = jnp.asarray(
                    rng.integers(num_patches, size=(steps_per_call, batch))
                )
                key, sub = jax.random.split(key)
                keys = jax.random.split(sub, (steps_per_call, batch))
                if chunk == steps_per_call and selection == "chunk":
                    sel = chunk_select(bank, idxs[0])
                    state, chunk_losses = chunk_run(state, sel, keys)
                    chunk_losses = np.asarray(chunk_losses)
                elif chunk == steps_per_call:
                    state, chunk_losses = run(state, bank, idxs, keys)
                    chunk_losses = np.asarray(chunk_losses)
                else:
                    rem = []
                    for j in range(chunk):
                        state, loss = step_fn(state, bank, idxs[j], keys[j])
                        rem.append(float(loss))
                    chunk_losses = np.asarray(rem)
                it += chunk
                losses.extend(chunk_losses.tolist())
                avg = float(chunk_losses.mean())
                if valid_bank is not None and (it % cfg.train.valid_every) < chunk:
                    last_valid, key = validate(state, key)
                loss_hist.append((avg, last_valid))
                print(f"iter {it}: dp loss {avg:.4f} "
                      f"({time.time() - t_start:.1f}s)")
                if not np.isfinite(avg):
                    print("NaN training loss — aborting")
                    aborted = True
                    break
                if ckpt is not None and it % cfg.train.save_every < chunk:
                    ckpt.save(start_step + it, state)
        else:
            for it in range(iters):
                idx = jnp.asarray(rng.integers(num_patches, size=batch))
                key, sub = jax.random.split(key)
                keys = jax.random.split(sub, batch)
                state, loss = step_fn(state, bank, idx, keys)
                losses.append(float(loss))
                if valid_bank is not None and it % cfg.train.valid_every == 0:
                    last_valid, key = validate(state, key)
                if it % log_every == 0:
                    avg = float(np.mean(losses[-log_every:]))
                    loss_hist.append((avg, last_valid))
                    print(f"iter {it}: dp loss {avg:.4f} "
                          f"({time.time() - t_start:.1f}s)")
                    if not np.isfinite(avg):
                        print("NaN training loss — aborting")
                        aborted = True
                        break
                if ckpt is not None and it > 0 and it % cfg.train.save_every == 0:
                    ckpt.save(start_step + it, state)

    if ckpt is not None:
        if not aborted:
            # never persist a NaN-poisoned state as the final checkpoint
            ckpt.save(start_step + iters, state)
        ckpt.close()
    if loss_hist and jax.process_index() == 0:
        os.makedirs(cfg.train.network_path, exist_ok=True)
        csv_path = os.path.join(cfg.train.network_path, cfg.train.net_name + ".csv")
        with open(csv_path, "ab") as fh:
            np.savetxt(fh, np.asarray(loss_hist, np.float64), delimiter=",")
    return state, np.asarray(losses)
