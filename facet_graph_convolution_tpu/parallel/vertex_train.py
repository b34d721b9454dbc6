"""Sharded end-to-end vertex training: chamfer-through-solver over the mesh.

The graph-parallel counterpart of the reference ``trainAccuracyNet``
(train.py:636-914): multiScale halo-exchange forward → sharded multi-scale
vertex solver (live normals, gradients through every exchange) → sampled
chamfer against the GT point set, computed with sharded distance reductions.

Sampling parity: the refined vertices are all-gathered once per step (small —
[V, 3]) so global sample indices match the single-device trainer exactly;
distances against the FULL sets stay sharded (local min + pmin / psum).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from facet_graph_convolution_tpu.config import Config
from facet_graph_convolution_tpu.data.dataset import FacetPatch, bucket_size, pad_patch_to
from facet_graph_convolution_tpu.models.augment import random_rotation, rotate_inputs, rotate_vec3
from facet_graph_convolution_tpu.parallel.halo import (
    GraphPartition,
    _sharded_normalize_tensor,
    build_partition,
    partition_operands,
    sharded_unet_forward_local,
)
from facet_graph_convolution_tpu.parallel.vertex_halo import (
    MultiscaleSolverOperands,
    OperatorSolverOperands,
    multiscale_solver_local,
    multiscale_solver_local_operator,
    prepare_multiscale_solver,
    prepare_multiscale_solver_operator,
)
from facet_graph_convolution_tpu.training.trainer import TrainState


def prepare_vertex_training(
    patch: FacetPatch, cfg: Config, num_shards: int
):
    """Pad the patch's graph/vertex/GT spaces for D shards and build all
    partition operands. Returns (padded arrays dict, conv partition, solver
    operands)."""
    group = 2 ** cfg.model.coarsening_steps
    align = group ** (cfg.model.coarsening_levels - 1) * num_shards
    padded = pad_patch_to(patch, bucket_size(patch.num_nodes, align))
    conv_part = build_partition(padded.adjs, num_shards)

    v = patch.vertices.shape[0]
    v_pad = (-v) % num_shards
    vertices = np.concatenate(
        [patch.vertices, np.zeros((v_pad, 3), np.float32)], axis=0
    )
    v_mask = np.concatenate(
        [np.ones(v, np.float32), np.zeros(v_pad, np.float32)]
    )
    v_faces = np.concatenate(
        [patch.v_faces.astype(np.int64),
         np.full((v_pad, patch.v_faces.shape[1]), -1, dtype=np.int64)], axis=0
    )
    g = patch.gt_vertices.shape[0]
    g_pad = (-g) % num_shards
    # sentinel far away so padded GT rows never win a min
    gt = np.concatenate(
        [patch.gt_vertices, np.full((g_pad, 3), 1e9, np.float32)], axis=0
    )
    gt_mask = np.concatenate(
        [np.ones(g, np.float32), np.zeros(g_pad, np.float32)]
    )
    faces_p = np.concatenate(
        [patch.faces.astype(np.int64),
         np.full((padded.num_nodes - patch.faces.shape[0], 3), -1, np.int64)],
        axis=0,
    )

    # solver body by config: "operator" (deduped tables + static A_s center
    # operator + hoisted projector — the round-4/5 single-chip default,
    # ported here round 5) or "naive" (per-slot body, fine-corner gather +
    # pool chain per iteration)
    prep = (prepare_multiscale_solver_operator
            if cfg.eval.vertex_solver == "operator"
            else prepare_multiscale_solver)
    solver_ops = prep(
        [padded.num_nodes // group**s for s in range(cfg.model.coarsening_levels)],
        faces_p, v_faces, vertices.shape[0], num_shards,
        coarsening_steps=cfg.model.coarsening_steps,
    )
    arrays = {
        "x": jnp.asarray(padded.inputs),
        "vertices": jnp.asarray(vertices),
        "v_mask": jnp.asarray(v_mask),
        "gt": jnp.asarray(gt),
        "gt_mask": jnp.asarray(gt_mask),
        "num_vertices": v,
        "num_gt": g,
    }
    return arrays, conv_part, solver_ops


def make_sharded_vertex_train_step(
    tx: optax.GradientTransformation,
    cfg: Config,
    conv_part: GraphPartition,
    solver_ops: MultiscaleSolverOperands,
    mesh: Mesh,
    axis: str = "graph",
    augment: bool = True,
):
    """(state, arrays, idx0, idx1, key) → (state, loss): full graph-parallel
    end-to-end step. ``idx0``/``idx1`` are GLOBAL sample indices into the
    refined vertices / GT points (reference train.py:781,1373)."""
    steps = cfg.model.coarsening_steps
    iter_nums = cfg.eval.ms_solver_iterations
    group = 2 ** steps
    levels = cfg.model.coarsening_levels
    operands = partition_operands(conv_part)
    conv_offsets = tuple(lvl.offsets for lvl in conv_part.levels)
    acc_thresh = 5000.0

    sop_dev = solver_ops.device_operands()
    in_specs = (
        P(),                                      # params
        P(axis), P(axis), P(axis), P(axis), P(axis),   # x, verts, vmask, gt, gtmask
        jax.tree.map(lambda _: P(axis), operands),  # conv operands
        jax.tree_util.tree_map(lambda _: P(axis), sop_dev),
        P(), P(), P(),                            # idx0, idx1, rot
    )

    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()))
    def loss_and_grads(params, x_b, v_b, vm_b, gt_b, gm_b, conv_ops, sop, idx0,
                       idx1, rot):
        conv_ops = jax.tree.map(lambda arr: arr[0], conv_ops)
        sop = jax.tree_util.tree_map(lambda a: a[0], sop)

        x_rot = rotate_inputs(rot, x_b)
        v_rot = rotate_vec3(rot, v_b)
        gt_rot = jnp.where(gm_b[:, None] > 0, rotate_vec3(rot, gt_b), gt_b)

        def loss_fn(params):
            y0, y1, y2 = sharded_unet_forward_local(
                params, x_rot, conv_ops, conv_offsets, axis,
                coarsening_steps=steps, multi_scale=True,
            )
            n0 = _sharded_normalize_tensor(y0, axis)
            n1 = _sharded_normalize_tensor(y1, axis)
            n2 = _sharded_normalize_tensor(y2, axis)
            if isinstance(solver_ops, OperatorSolverOperands):
                refined, _ = multiscale_solver_local_operator(
                    v_rot, (n0, n1, n2), sop,
                    solver_ops.vfu_offsets, solver_ops.fc_offsets, axis,
                    coarsening_steps=steps, iter_nums=iter_nums,
                )
            else:
                refined, _ = multiscale_solver_local(
                    v_rot, (n0, n1, n2), sop,
                    solver_ops.fv_offsets, solver_ops.vf_offsets, axis,
                    coarsening_steps=steps, iter_nums=iter_nums,
                )
            # chamfer: gather the full refined set once (small), sample
            refined_full = jax.lax.all_gather(refined, axis).reshape(-1, 3)
            sp0 = jnp.take(refined_full, idx0, axis=0)       # [s0, 3]
            gt_full = jax.lax.all_gather(gt_rot, axis).reshape(-1, 3)
            sp1 = jnp.take(gt_full, idx1, axis=0)            # [s1, 3]

            # precision: sampled refined vs FULL GT (sharded rows; the
            # cross-shard min goes through all_gather — pmin has no VJP)
            d0 = jnp.linalg.norm(sp0[:, None, :] - gt_rot[None, :, :], axis=-1)
            d0 = jnp.where(gm_b[None, :] > 0, d0, jnp.inf)
            local_min = jnp.min(d0, axis=1)                  # [s0]
            prec = jnp.min(jax.lax.all_gather(local_min, axis), axis=0)
            prec = jnp.where(prec <= acc_thresh, prec, 0.0)

            # completeness: per SAMPLED GT point, nearest FULL refined row
            # (reference reduces over P0, train.py:1411)
            d1 = jnp.linalg.norm(sp1[:, None, :] - refined[None, :, :], axis=-1)
            d1 = jnp.where(vm_b[None, :] > 0, d1, jnp.inf)
            comp = jnp.min(jax.lax.all_gather(jnp.min(d1, axis=1), axis), axis=0)
            comp = jnp.where(comp <= acc_thresh, comp, 0.0)
            return 1000.0 * (jnp.mean(prec) + jnp.mean(comp))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return jax.lax.pmean(loss, axis), jax.lax.pmean(grads, axis)

    def _rot(key):
        if key is None or not augment:
            return jnp.eye(3, dtype=jnp.float32)
        rot_key, _ = jax.random.split(key)
        return random_rotation(rot_key)

    @jax.jit
    def _step(state: TrainState, arrays, idx0, idx1, rot):
        loss, grads = loss_and_grads(
            state.params, arrays["x"], arrays["vertices"], arrays["v_mask"],
            arrays["gt"], arrays["gt_mask"], operands, sop_dev, idx0, idx1, rot,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    @jax.jit
    def _eval(params, arrays, idx0, idx1):
        loss, _ = loss_and_grads(
            params, arrays["x"], arrays["vertices"], arrays["v_mask"],
            arrays["gt"], arrays["gt_mask"], operands, sop_dev, idx0, idx1,
            jnp.eye(3, dtype=jnp.float32),
        )
        return loss

    def step(state: TrainState, arrays, idx0, idx1, key):
        return _step(state, arrays, idx0, idx1, _rot(key))

    step.eval = _eval
    return step


def train_with_vertices_sharded(
    cfg: Config,
    patch: FacetPatch,
    mesh: Mesh,
    num_iterations: int,
    valid_patches: Optional[Sequence[FacetPatch]] = None,
    axis: str = "graph",
    seed: int = 0,
    log_every: int = 10,
    checkpoint: bool = False,
):
    """Graph-parallel end-to-end vertex training DRIVER (the sharded
    counterpart of ``training.trainer.train_with_vertices`` / reference
    ``trainAccuracyNet``, train.py:636-914): one large edge-partitioned
    mesh, chamfer-through-solver loss each step, rotation augmentation,
    Orbax checkpoint/resume, periodic validation over ``valid_patches``
    (each partitioned over the same mesh), loss-history CSV, NaN abort."""
    import os

    from facet_graph_convolution_tpu.training.checkpoint import CheckpointManager
    from facet_graph_convolution_tpu.training.trainer import create_train_state

    n_dev = mesh.shape[axis]
    arrays, conv_part, solver_ops = prepare_vertex_training(patch, cfg, n_dev)
    key = jax.random.PRNGKey(seed)
    state, tx = create_train_state(key, cfg, multi_scale=True)
    step = make_sharded_vertex_train_step(
        tx, cfg, conv_part, solver_ops, mesh, axis=axis,
        augment=cfg.train.augment_rotations,
    )

    ckpt = CheckpointManager(cfg.train.network_path, cfg.train.net_name) if checkpoint else None
    start_step = 0
    if ckpt is not None:
        state, start_step = ckpt.restore(state)
        if start_step:
            from jax.sharding import NamedSharding

            state = jax.device_put(state, NamedSharding(mesh, P()))

    valid = []
    for vp in valid_patches or []:
        v_arrays, v_part, v_sops = prepare_vertex_training(vp, cfg, n_dev)
        v_step = make_sharded_vertex_train_step(
            tx, cfg, v_part, v_sops, mesh, axis=axis, augment=False,
        )
        valid.append((v_step.eval, v_arrays))

    samples = cfg.train.chamfer_samples
    rng = np.random.default_rng(seed)
    losses = []
    loss_hist = []
    last_valid = float("nan")
    save_every = min(cfg.train.save_every, 500)   # reference uses 500 here
    with mesh:
        for it in range(num_iterations):
            idx0 = jnp.asarray(rng.integers(0, arrays["num_vertices"], samples))
            idx1 = jnp.asarray(rng.integers(0, arrays["num_gt"], samples))
            key, sub = jax.random.split(key)
            state, loss = step(state, arrays, idx0, idx1, sub)
            losses.append(float(loss))
            if valid and it % cfg.train.valid_every == 0:
                vloss = 0.0
                for eval_fn, v_arrays in valid:
                    vi0 = jnp.asarray(
                        rng.integers(0, v_arrays["num_vertices"], samples))
                    vi1 = jnp.asarray(rng.integers(0, v_arrays["num_gt"], samples))
                    vloss += float(eval_fn(state.params, v_arrays, vi0, vi1))
                last_valid = vloss / len(valid)
            if it % log_every == 0:
                avg = float(np.mean(losses[-log_every:]))
                loss_hist.append((avg, last_valid))
                print(f"iter {it}: sharded vertex loss {avg:.4f}"
                      + (f" valid {last_valid:.4f}" if valid else ""))
                if not np.isfinite(avg):
                    print("NaN training loss — aborting")
                    break
            if ckpt is not None and it > 0 and it % save_every == 0:
                ckpt.save(start_step + it, state)
    if ckpt is not None:
        ckpt.save(start_step + num_iterations, state)
        ckpt.close()
    if jax.process_index() == 0 and loss_hist:
        os.makedirs(cfg.train.network_path, exist_ok=True)
        csv_path = os.path.join(cfg.train.network_path,
                                cfg.train.net_name + ".csv")
        with open(csv_path, "ab") as fh:
            np.savetxt(fh, np.asarray(loss_hist, np.float64), delimiter=",")
    return state, np.asarray(losses)
