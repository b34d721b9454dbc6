"""Patch-batch data parallelism.

The reference trains one patch per step on one device (train.py:404-405,
558). Here a batch of bucket-padded patches is sharded over the ``data`` mesh
axis; each device runs the full model on its patch and gradients are averaged
with ``psum`` — standard DP via ``shard_map``.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facet_graph_convolution_tpu.config import Config
from facet_graph_convolution_tpu.data.dataset import FacetPatch, pad_patch_to
from facet_graph_convolution_tpu.models.augment import (
    random_rotation,
    rotate_inputs,
    rotate_vec3,
)
from facet_graph_convolution_tpu.models.losses import face_normals_loss
from facet_graph_convolution_tpu.models.unet import unet_apply
from facet_graph_convolution_tpu.ops.normalization import normalize_tensor
from facet_graph_convolution_tpu.training.trainer import TrainState


def stack_patches(patches: Sequence[FacetPatch], target: int):
    """Pad each patch to ``target`` fine nodes and stack into batch arrays:
    (x [B,N,C], adjs tuple of [B,N_l,K], gt [B,N,3])."""
    padded = [pad_patch_to(p, target) for p in patches]
    x = np.stack([p.inputs for p in padded])
    levels = len(padded[0].adjs)
    adjs = tuple(
        np.stack([p.adjs[lvl] for p in padded]) for lvl in range(levels)
    )
    gt = np.stack([p.gt_normals for p in padded])
    return x, adjs, gt


def make_dp_train_step(
    tx: optax.GradientTransformation,
    cfg: Config,
    mesh: Mesh,
    axis: str = "data",
):
    """Jitted DP step: (state, x [B,N,C], adjs [B,...], gt [B,N,3], keys [B,2])
    → (state, mean loss). B must equal the ``data`` axis size (or a multiple —
    devices then loop locally via vmap)."""
    steps = cfg.model.coarsening_steps
    loss_samples = cfg.train.loss_samples
    augment = cfg.train.augment_rotations

    def per_patch_loss(params, x, adjs, gt, key):
        rot_key, samp_key = jax.random.split(key)
        if augment:
            rot = random_rotation(rot_key)
            x = rotate_inputs(rot, x)
            gt = rotate_vec3(rot, gt)
        sample_idx = jax.random.randint(samp_key, (loss_samples,), 0, x.shape[0])
        y = normalize_tensor(unet_apply(params, x, adjs, coarsening_steps=steps))
        return face_normals_loss(
            jnp.take(y, sample_idx, axis=0), jnp.take(gt, sample_idx, axis=0)
        )

    n_levels = cfg.model.coarsening_levels
    adj_specs = tuple(P(axis) for _ in range(n_levels))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), adj_specs, P(axis), P(axis)),
        out_specs=(P(), P()),
    )
    def sharded_grads(params, x, adjs, gt, keys):
        def local_loss(params):
            losses = jax.vmap(
                lambda xb, ab, gb, kb: per_patch_loss(params, xb, ab, gb, kb),
                in_axes=(0, 0, 0, 0),
            )(x, adjs, gt, keys)
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(local_loss)(params)
        loss = jax.lax.pmean(loss, axis)
        grads = jax.lax.pmean(grads, axis)
        return loss, grads

    @jax.jit
    def step(state: TrainState, x, adjs, gt, keys):
        loss, grads = sharded_grads(state.params, x, adjs, gt, keys)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def train_normals_dp(
    cfg: Config,
    train_set,
    mesh: Mesh,
    num_iterations: Optional[int] = None,
    log_every: int = 50,
):
    """Data-parallel training driver: every step samples one bucket-padded
    patch per device along the ``data`` axis (the multi-patch generalization
    of the reference's one-patch-per-step loop, train.py:549-624)."""
    import jax.numpy as jnp

    from facet_graph_convolution_tpu.training.trainer import create_train_state

    batch = mesh.shape[cfg.shard.data_axis]
    iters = num_iterations or cfg.train.num_iterations
    target = max(p.num_nodes for p in train_set.patches)
    group = (2 ** cfg.model.coarsening_steps) ** (cfg.model.coarsening_levels - 1)
    target = ((target + group - 1) // group) * group

    key = jax.random.PRNGKey(cfg.train.seed)
    state, tx = create_train_state(key, cfg)
    step_fn = make_dp_train_step(tx, cfg, mesh, axis=cfg.shard.data_axis)

    rng = np.random.default_rng(cfg.train.seed)
    losses = []
    with mesh:
        for it in range(iters):
            picks = [
                train_set.patches[int(rng.integers(len(train_set.patches)))]
                for _ in range(batch)
            ]
            x, adjs, gt = stack_patches(picks, target)
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, batch)
            state, loss = step_fn(
                state, jnp.asarray(x), tuple(jnp.asarray(a) for a in adjs),
                jnp.asarray(gt), keys,
            )
            losses.append(float(loss))
            if it % log_every == 0:
                print(f"iter {it}: dp loss {losses[-1]:.4f}")
    return state, np.asarray(losses)
