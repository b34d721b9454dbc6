"""Serving path: batched multi-mesh inference and AOT-exported executables.

The reference has no serving story — ``infer.py`` rebuilds the TF graph and
session per run (infer.py:32-123, train.py:50-87). This module provides the
production equivalent, TPU-first:

- :class:`InferenceServer` — holds restored parameters and a cache of
  compiled forward executables per node bucket, so repeated requests skip
  tracing/compilation; patches from MANY meshes are padded to a shared
  bucket and run as ONE batched (vmapped) device call, keeping the chip
  fed instead of dispatching one small graph at a time;
- :func:`export_forward` / :func:`load_forward` — ahead-of-time export of
  the compiled forward as portable bytes (``jax.export``), so a serving
  process can load and run the model without the framework's model code or
  a tracing step.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facet_graph_convolution_tpu.config import Config, default_config
from facet_graph_convolution_tpu.data.dataset import (
    InferenceMesh,
    bucket_size,
    pad_patch_to,
)
from facet_graph_convolution_tpu.geometry.mesh_math import normalize_rows
from facet_graph_convolution_tpu.models.unet import unet_apply
from facet_graph_convolution_tpu.ops.normalization import normalize_tensor
from facet_graph_convolution_tpu.ops.vertex_update import update_positions_edges


def _build_mesh(vertices: np.ndarray, faces: np.ndarray, cfg: Config,
                seed: int = 0, with_vertices: bool = False) -> InferenceMesh:
    # a fixed coarsening seed keeps serving DETERMINISTIC: Graclus matching
    # is randomized (lib/coarsening.py:57,96) and an unseeded build gives a
    # different pyramid — and a different answer — per request
    mesh = InferenceMesh(
        max_patch_size=cfg.data.max_patch_size,
        coarsening_steps=cfg.model.coarsening_steps,
        coarsening_levels=cfg.model.coarsening_levels,
        k_faces=cfg.data.k_faces,
        min_patch_size=cfg.data.min_patch_size,
        seed=seed,
    )
    if with_vertices:
        mesh.add_mesh_with_vertices(vertices, faces)
    else:
        mesh.add_mesh(vertices, faces)
    return mesh


class InferenceServer:
    """Persistent inference service over one set of trained parameters.

    ``denoise`` serves a single mesh; ``denoise_batch`` pads every patch of
    every request to one shared node bucket and runs a single batched
    forward — the serving analogue of the trainer's bucket batching.
    """

    def __init__(self, cfg: Optional[Config] = None, params=None,
                 bucket_align: int = 1024, solver_iterations: Optional[int] = None,
                 include_vertices: Optional[bool] = None, seed: int = 0,
                 max_compiled: int = 16):
        self.cfg = cfg or default_config()
        if include_vertices is None:
            include_vertices = self.cfg.model.include_vertices
        self.include_vertices = include_vertices
        if params is None:
            from facet_graph_convolution_tpu.inference.driver import _restore_params

            params = _restore_params(self.cfg, multi_scale=include_vertices)
        self.params = params
        self.bucket_align = bucket_align
        self.solver_iterations = (
            solver_iterations or self.cfg.eval.solver_iterations
        )
        self.seed = seed
        # LRU-bounded: every distinct (batch, bucket-shape) key pins a
        # compiled executable (device program + host buffers); a long-lived
        # server over diverse mesh sizes must not accumulate them forever
        import collections

        self.max_compiled = max(int(max_compiled), 1)
        self._compiled: "collections.OrderedDict[Tuple[int, ...], jax.stages.Compiled]" = (
            collections.OrderedDict()
        )

    # -- compiled forward cache ------------------------------------------

    def _forward_fn(self):
        steps = self.cfg.model.coarsening_steps
        multi = self.include_vertices

        def forward(params, x, a0, a1, a2):
            y = unet_apply(params, x, (a0, a1, a2), coarsening_steps=steps,
                           multi_scale=multi)
            if multi:
                return tuple(normalize_tensor(h) for h in y)
            return normalize_tensor(y)

        return forward

    def _compile(self, batch: int, shapes: Tuple[Tuple[int, int], ...]):
        """AOT-compile the batched forward for (batch, per-level adj shapes)."""
        key = (batch,) + tuple(s for shape in shapes for s in shape)
        if key in self._compiled:
            self._compiled.move_to_end(key)
            return self._compiled[key]
        forward = self._forward_fn()
        batched = jax.vmap(forward, in_axes=(None, 0, 0, 0, 0))
        n0 = shapes[0][0]
        arg_shapes = (
            jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), self.params
            ),
            jax.ShapeDtypeStruct((batch, n0, 6), jnp.float32),
            *[
                jax.ShapeDtypeStruct((batch,) + s, jnp.int32)
                for s in shapes
            ],
        )
        compiled = jax.jit(batched).lower(*arg_shapes).compile()
        self._compiled[key] = compiled
        while len(self._compiled) > self.max_compiled:
            self._compiled.popitem(last=False)
        return compiled

    # -- serving ----------------------------------------------------------

    def denoise(self, vertices: np.ndarray, faces: np.ndarray):
        """Denoise one mesh: returns (updated vertices [V,3], normals [F,3])
        — or the :func:`denoise_batch_with_vertices` dict when the server
        was built with ``include_vertices=True``."""
        out = self.denoise_batch([(vertices, faces)])
        return out[0]

    def _stack_batch(self, built, with_vertices: bool):
        """Pad every patch of every request to one shared node bucket and
        stack (x, per-level adjacencies) on a batch axis."""
        flat: List[Tuple[int, object]] = []          # (mesh index, patch)
        for mi, mesh in enumerate(built):
            for p in mesh.patches:
                flat.append((mi, p))
        target = max(
            bucket_size(p.num_nodes, self.bucket_align) for _, p in flat
        )
        padded = [(mi, pad_patch_to(p, target)) for mi, p in flat]
        levels = len(padded[0][1].adjs)
        k_max = [max(p.adjs[lvl].shape[1] for _, p in padded)
                 for lvl in range(levels)]
        xs, adjs_stacked = [], [[] for _ in range(levels)]
        for _, p in padded:
            xs.append(p.inputs)
            for lvl in range(levels):
                a = p.adjs[lvl]
                if a.shape[1] < k_max[lvl]:
                    a = np.pad(a, ((0, 0), (0, k_max[lvl] - a.shape[1])))
                adjs_stacked[lvl].append(a)
        x_b = jnp.asarray(np.stack(xs))
        adj_b = [jnp.asarray(np.stack(lv)) for lv in adjs_stacked]
        return padded, x_b, adj_b

    def denoise_batch(self, meshes: Sequence[Tuple[np.ndarray, np.ndarray]]):
        """Denoise several meshes in one batched device call.

        All patches across all requests are padded to the largest node
        bucket and stacked on a batch axis; the forward runs once. The
        per-mesh vertex solver and reassembly stay per-mesh (their edge maps
        differ in size). With ``include_vertices=True`` this dispatches to
        :func:`denoise_batch_with_vertices`.
        """
        if self.include_vertices:
            return self.denoise_batch_with_vertices(meshes)
        built = [_build_mesh(v, f, self.cfg, seed=self.seed)
                 for v, f in meshes]
        padded, x_b, adj_b = self._stack_batch(built, with_vertices=False)
        shapes = tuple(tuple(a.shape[1:]) for a in adj_b)
        compiled = self._compile(len(padded), shapes)
        out = np.asarray(compiled(self.params, x_b, *adj_b))

        # reassemble per mesh (overlap-sum + normalize, train.py:123-136)
        results = []
        for mi, mesh in enumerate(built):
            predicted = np.zeros((mesh.num_faces, 3), np.float64)
            for bi, (pmi, p) in enumerate(padded):
                if pmi != mi:
                    continue
                vals = out[bi]
                if p.perm_inv is not None:
                    vals = vals[p.perm_inv]
                predicted[p.patch_indices] += vals[: p.num_real]
            predicted = normalize_rows(predicted.astype(np.float32))
            # same solver options as inference.driver.infer_normals — the
            # served vertices must match the driver's for one config/params
            refined = update_positions_edges(
                jnp.asarray(mesh.vertices),
                jnp.asarray(predicted),
                jnp.asarray(mesh.edge_map),
                jnp.asarray(mesh.v_e_map),
                iter_num=self.solver_iterations,
                lmbd=(1.0 / 18.0 if self.cfg.eval.solver_lambda == "reference"
                      else self.cfg.eval.solver_lambda),
                checkpoint=False,
                adaptive_tol=self.cfg.eval.solver_adaptive_tol,
                trust=self.cfg.eval.solver_trust,
            )
            results.append((np.asarray(refined), predicted))
        return results

    def denoise_batch_with_vertices(
        self, meshes: Sequence[Tuple[np.ndarray, np.ndarray]]
    ):
        """Batched multi-scale serving (reference ``inferNet`` semantics,
        train.py:148-376): ONE batched multiScale forward for every patch of
        every request, then the multi-scale vertex solver per patch and
        weighted overlap-averaging of vertex predictions per mesh
        (train.py:308-313). Returns one dict per mesh (points, points_mid,
        points_coarse, fine/mid/coarse normals — the ``infer_with_vertices``
        contract)."""
        from facet_graph_convolution_tpu.ops.pooling import tree_unpool
        from facet_graph_convolution_tpu.ops.vertex_update import (
            update_positions_multiscale,
        )

        steps = self.cfg.model.coarsening_steps
        iter_nums = self.cfg.eval.ms_solver_iterations

        built = [_build_mesh(v, f, self.cfg, seed=self.seed,
                             with_vertices=True) for v, f in meshes]

        padded, x_b, adj_b = self._stack_batch(built, with_vertices=True)
        shapes = tuple(tuple(a.shape[1:]) for a in adj_b)
        compiled = self._compile(len(padded), shapes)
        n0_b, n1_b, n2_b = compiled(self.params, x_b, *adj_b)

        @jax.jit
        def solve(v, n0, n1, n2, faces, v_faces):
            return update_positions_multiscale(
                v, [n0, n1, n2], faces, v_faces,
                coarsening_steps=steps, iter_nums=iter_nums, checkpoint=False,
            )

        results = []
        for mi, mesh in enumerate(built):
            num_v, num_f = mesh.num_vertices, mesh.num_faces
            out_points = np.zeros((num_v, 3), np.float64)
            out_mid = np.zeros((num_v, 3), np.float64)
            out_coarse = np.zeros((num_v, 3), np.float64)
            weights = np.zeros((num_v, 1), np.float64)
            fine_n = np.zeros((num_f, 3), np.float32)
            mid_n = np.zeros((num_f, 3), np.float32)
            coarse_n = np.zeros((num_f, 3), np.float32)
            for bi, (pmi, p) in enumerate(padded):
                if pmi != mi:
                    continue
                n0, n1, n2 = n0_b[bi], n1_b[bi], n2_b[bi]
                refined, dx = solve(
                    jnp.asarray(p.vertices), n0, n1, n2,
                    jnp.asarray(p.faces), jnp.asarray(p.v_faces),
                )
                refined = np.asarray(refined)
                refined_mid = refined - np.asarray(dx[2])
                refined_coarse = refined_mid - np.asarray(dx[1])
                up1 = normalize_tensor(tree_unpool(n1, steps))
                up2 = normalize_tensor(tree_unpool(n2, 2 * steps))
                for target_arr, lvl_vals in ((fine_n, n0), (mid_n, up1),
                                             (coarse_n, up2)):
                    vals = np.asarray(lvl_vals)[p.perm_inv][: p.num_real]
                    target_arr[p.f_old_idx] = vals
                out_points[p.v_old_idx] += refined
                out_mid[p.v_old_idx] += refined_mid
                out_coarse[p.v_old_idx] += refined_coarse
                weights[p.v_old_idx] += 1.0
            w = np.maximum(weights, 1.0)
            results.append({
                "points": (out_points / w).astype(np.float32),
                "points_mid": (out_mid / w).astype(np.float32),
                "points_coarse": (out_coarse / w).astype(np.float32),
                "fine_normals": fine_n,
                "mid_normals": mid_n,
                "coarse_normals": coarse_n,
            })
        return results


# ---------------------------------------------------------------------------
# AOT export (portable compiled forward)
# ---------------------------------------------------------------------------

def export_forward(
    cfg: Config,
    params,
    num_nodes: int,
    adj_widths: Sequence[int],
    batch: int = 1,
    multi_scale: bool = False,
    bake_params: bool = False,
) -> bytes:
    """Serialize the batched forward as a portable executable spec
    (``jax.export``): the bytes embed StableHLO + the calling convention and
    can be loaded by :func:`load_forward` in a process without this model
    code.

    By default parameters are an ARGUMENT of the exported callable (a pytree
    with ``params``'s structure), so a new checkpoint swaps in without
    re-exporting; ``bake_params=True`` freezes them into the executable as
    constants instead (self-contained artifact). ``multi_scale=True`` exports
    the three-head forward (fine, mid, coarse normals)."""
    from jax import export as jax_export

    steps = cfg.model.coarsening_steps

    def fwd_one(prm, xx, b0, b1, b2):
        y = unet_apply(prm, xx, (b0, b1, b2), coarsening_steps=steps,
                       multi_scale=multi_scale)
        if multi_scale:
            return tuple(normalize_tensor(h) for h in y)
        return normalize_tensor(y)

    n = num_nodes
    data_args = (
        jax.ShapeDtypeStruct((batch, n, 6), jnp.float32),
        jax.ShapeDtypeStruct((batch, n, adj_widths[0]), jnp.int32),
        jax.ShapeDtypeStruct((batch, n // 4, adj_widths[1]), jnp.int32),
        jax.ShapeDtypeStruct((batch, n // 16, adj_widths[2]), jnp.int32),
    )
    if bake_params:
        def forward(x, a0, a1, a2):
            return jax.vmap(lambda *a: fwd_one(params, *a))(x, a0, a1, a2)

        exported = jax_export.export(jax.jit(forward))(*data_args)
    else:
        def forward(prm, x, a0, a1, a2):
            return jax.vmap(
                lambda *a: fwd_one(prm, *a)
            )(x, a0, a1, a2)

        param_shapes = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params
        )
        exported = jax_export.export(jax.jit(forward))(param_shapes, *data_args)
    return bytes(exported.serialize())


def load_forward(data: bytes):
    """Deserialize an exported forward; returns a callable
    ``([params,] x [B,N,6], adj0, adj1, adj2) -> normals`` — pass the params
    pytree first unless the export baked them in."""
    from jax import export as jax_export

    exported = jax_export.deserialize(data)
    return lambda *args: exported.call(*args)


def save_exported(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(data)


def load_exported(path: str) -> bytes:
    with open(path, "rb") as fh:
        return fh.read()
