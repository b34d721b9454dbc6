"""Inference drivers.

- :func:`infer_normals` — per-patch forward, inverse-permute, strip fake
  nodes, SUM overlapping patch normals into the full mesh, normalize, then
  run the edge-map vertex solver (reference ``inferNetOld``,
  train.py:29-144);
- :func:`infer_with_vertices` — multiScale forward per patch, multi-scale
  vertex solver, weighted overlap-averaging of vertices (reference
  ``inferNet``, train.py:148-376);
- :func:`infer_directory` — the file-level CLI behavior (reference
  ``infer.py:32-123``): iterate a directory, skip existing results, write the
  denoised mesh plus normal-colored visualization meshes.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facet_graph_convolution_tpu.config import Config, default_config
from facet_graph_convolution_tpu.data.dataset import InferenceMesh, MeshDataset
from facet_graph_convolution_tpu.geometry import colored_mesh, load_obj, write_obj
from facet_graph_convolution_tpu.geometry.mesh_math import normalize_rows
from facet_graph_convolution_tpu.geometry.obj_io import normals_to_colors
from facet_graph_convolution_tpu.models.unet import unet_apply
from facet_graph_convolution_tpu.ops.normalization import normalize_tensor
from facet_graph_convolution_tpu.ops.pooling import tree_unpool
from facet_graph_convolution_tpu.ops.vertex_update import (
    update_positions_edges,
    update_positions_multiscale,
)
from facet_graph_convolution_tpu.training.checkpoint import CheckpointManager
from facet_graph_convolution_tpu.training.trainer import TrainState, create_train_state


def _restore_params(cfg: Config, multi_scale: bool):
    state, _ = create_train_state(
        jax.random.PRNGKey(0), cfg, multi_scale=multi_scale
    )
    ckpt = CheckpointManager(cfg.train.network_path, cfg.train.net_name)
    if ckpt.latest_step() is None:
        ckpt.close()
        raise FileNotFoundError(
            f"no checkpoint under {cfg.train.network_path}{cfg.train.net_name} "
            "(the reference hard-errors here too, train.py:82-87)"
        )
    state, _ = ckpt.restore(state)
    ckpt.close()
    return state.params


def infer_normals(
    mesh: MeshDataset,
    cfg: Config,
    params=None,
    solver_iterations: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Predict facet normals patch-by-patch and solve vertex positions over
    the edge map. Returns (updated vertices [V,3], predicted normals [F,3])."""
    params = params if params is not None else _restore_params(cfg, multi_scale=False)
    steps = cfg.model.coarsening_steps
    iters = solver_iterations or cfg.eval.solver_iterations

    from facet_graph_convolution_tpu.ops.conv import FacetConvVariant
    from facet_graph_convolution_tpu.training.trainer import (
        _apply_model,
        _graph_arrays,
    )

    @jax.jit
    def forward(params, x, adjs, adj_ts, mults):
        y = _apply_model(params, x, adjs, adj_ts, mults, steps=steps,
                         variant=FacetConvVariant.DEFAULT, alpha=0.1)
        return normalize_tensor(y)

    num_faces = mesh.faces.shape[0] if mesh.faces is not None else max(
        int(np.max(p.patch_indices)) + 1 for p in mesh.patches
    )
    predicted = np.zeros((num_faces, 3), np.float64)
    for patch in mesh.patches:
        x = jnp.asarray(patch.inputs)
        adjs, adj_ts, mults = _graph_arrays(patch.adjs)
        out = np.asarray(forward(params, x, adjs, adj_ts, mults))
        if patch.perm_inv is not None:
            out = out[patch.perm_inv]
        out = out[: patch.num_real]
        # overlapping patches SUM their predictions (train.py:123-126);
        # the final normalize makes the sum a blend
        predicted[patch.patch_indices] += out
    predicted = normalize_rows(predicted.astype(np.float32))

    vertices = jnp.asarray(mesh.vertices)
    refined = update_positions_edges(
        vertices,
        jnp.asarray(predicted),
        jnp.asarray(mesh.edge_map),
        jnp.asarray(mesh.v_e_map),
        iter_num=iters,
        lmbd=(1.0 / 18.0 if cfg.eval.solver_lambda == "reference"
              else cfg.eval.solver_lambda),
        checkpoint=False,
        adaptive_tol=cfg.eval.solver_adaptive_tol,
        trust=cfg.eval.solver_trust,
    )
    return np.asarray(refined), predicted


def infer_with_vertices(
    mesh: MeshDataset,
    cfg: Config,
    params=None,
):
    """Multi-scale inference with the vertex solver (reference ``inferNet``,
    train.py:148-376). Returns a dict of fine/mid/coarse points and normals.
    """
    params = params if params is not None else _restore_params(cfg, multi_scale=True)
    steps = cfg.model.coarsening_steps
    iter_nums = cfg.eval.ms_solver_iterations

    from facet_graph_convolution_tpu.ops.conv import FacetConvVariant
    from facet_graph_convolution_tpu.training.trainer import (
        _apply_model,
        _graph_arrays,
    )

    @jax.jit
    def forward(params, x, adjs, adj_ts, mults):
        y0, y1, y2 = _apply_model(
            params, x, adjs, adj_ts, mults, steps=steps, multi_scale=True,
            variant=FacetConvVariant.DEFAULT, alpha=0.1,
        )
        return normalize_tensor(y0), normalize_tensor(y1), normalize_tensor(y2)

    use_operator = cfg.eval.vertex_solver == "operator"

    @jax.jit
    def solve(v, n0, n1, n2, faces, v_faces, tables=None):
        if tables is not None:
            from facet_graph_convolution_tpu.ops.vertex_update import (
                update_positions_multiscale_operator,
            )

            return update_positions_multiscale_operator(
                v, [n0, n1, n2], faces, v_faces, tables,
                coarsening_steps=steps, iter_nums=iter_nums, checkpoint=False,
            )
        refined, dx = update_positions_multiscale(
            v, [n0, n1, n2], faces, v_faces,
            coarsening_steps=steps, iter_nums=iter_nums, checkpoint=False,
        )
        return refined, dx

    num_v = mesh.num_vertices
    num_f = mesh.num_faces
    out_points = np.zeros((num_v, 3), np.float64)
    out_points_mid = np.zeros((num_v, 3), np.float64)
    out_points_coarse = np.zeros((num_v, 3), np.float64)
    weights = np.zeros((num_v, 1), np.float64)
    fine_n = np.zeros((num_f, 3), np.float32)
    mid_n = np.zeros((num_f, 3), np.float32)
    coarse_n = np.zeros((num_f, 3), np.float32)

    for patch in mesh.patches:
        x = jnp.asarray(patch.inputs)
        adjs, adj_ts, mults = _graph_arrays(patch.adjs)
        n0, n1, n2 = forward(params, x, adjs, adj_ts, mults)
        tables = None
        if use_operator:
            from facet_graph_convolution_tpu.training.trainer import (
                _solver_tables,
            )

            tables = _solver_tables(cfg, patch)
        refined, dx = solve(
            jnp.asarray(patch.vertices), n0, n1, n2,
            jnp.asarray(patch.faces), jnp.asarray(patch.v_faces), tables,
        )
        refined = np.asarray(refined)
        refined_mid = refined - np.asarray(dx[2])
        refined_coarse = refined_mid - np.asarray(dx[1])

        # per-face normals mapped back to original order, upsampled mid/coarse
        up1 = normalize_tensor(tree_unpool(n1, steps))
        up2 = normalize_tensor(tree_unpool(n2, 2 * steps))
        for target, levels in ((fine_n, n0), (mid_n, up1), (coarse_n, up2)):
            vals = np.asarray(levels)[patch.perm_inv][: patch.num_real]
            target[patch.f_old_idx] = vals

        out_points[patch.v_old_idx] += refined
        out_points_mid[patch.v_old_idx] += refined_mid
        out_points_coarse[patch.v_old_idx] += refined_coarse
        weights[patch.v_old_idx] += 1.0

    w = np.maximum(weights, 1.0)
    return {
        "points": (out_points / w).astype(np.float32),
        "points_mid": (out_points_mid / w).astype(np.float32),
        "points_coarse": (out_points_coarse / w).astype(np.float32),
        "fine_normals": fine_n,
        "mid_normals": mid_n,
        "coarse_normals": coarse_n,
    }


def infer_directory(
    input_dir: str,
    cfg: Optional[Config] = None,
    with_vertices: Optional[bool] = None,
    params=None,
) -> None:
    """Denoise every ``.obj`` in a directory (reference ``infer``,
    infer.py:32-123)."""
    cfg = cfg or default_config()
    if with_vertices is None:
        with_vertices = cfg.model.include_vertices
    results = cfg.eval.results_path
    os.makedirs(results, exist_ok=True)

    for noisy_file in sorted(os.listdir(input_dir)):
        if not noisy_file.endswith(".obj"):
            continue
        stem = noisy_file[:-4]
        denoised_path = os.path.join(results, stem + "_denoised.obj")
        if os.path.isfile(denoised_path) and not cfg.eval.overwrite_results:
            print(f"skipping {noisy_file}: result exists")
            continue

        print(f"processing {noisy_file}")
        t0 = time.time()
        vertices, faces, _ = load_obj(input_dir, noisy_file)
        mesh = InferenceMesh(
            max_patch_size=cfg.data.max_patch_size,
            coarsening_steps=cfg.model.coarsening_steps,
            coarsening_levels=cfg.model.coarsening_levels,
            k_faces=cfg.data.k_faces,
            k_vertices=cfg.data.k_vertices,
            max_edges=cfg.data.max_edges,
        )
        if with_vertices:
            mesh.add_mesh_with_vertices(vertices, faces)
        else:
            mesh.add_mesh(vertices, faces)
        print(f"  preprocessing: {time.time() - t0:.2f}s")

        t0 = time.time()
        if with_vertices:
            out = infer_with_vertices(mesh, cfg, params=params)
            write_obj(out["points"], mesh.faces, denoised_path)
            write_obj(out["points_mid"], mesh.faces,
                      os.path.join(results, stem + "_d_mid.obj"))
            write_obj(out["points_coarse"], mesh.faces,
                      os.path.join(results, stem + "_d_coarse.obj"))
            pred_normals = out["fine_normals"]
            extra_heads = [
                ("_mid_normals_s.obj", out["mid_normals"]),
                ("_coarse_normals_s.obj", out["coarse_normals"]),
            ]
            inferred_name = "_fine_normals_s.obj"
        else:
            points, pred_normals = infer_normals(mesh, cfg, params=params)
            write_obj(points, mesh.faces, denoised_path)
            extra_heads = []
            inferred_name = "_inferred_normals.obj"
        print(f"  inference: {time.time() - t0:.2f}s")

        # normal-colored visualization meshes (infer.py:105-123)
        nv, nf = colored_mesh(mesh.vertices, mesh.faces, normals_to_colors(pred_normals))
        write_obj(nv, nf, os.path.join(results, stem + inferred_name))
        ov, of = colored_mesh(mesh.vertices, mesh.faces, normals_to_colors(mesh.normals))
        write_obj(ov, of, os.path.join(results, stem + "_original_normals.obj"))
        for suffix, normals in extra_heads:
            cv, cf = colored_mesh(mesh.vertices, mesh.faces, normals_to_colors(normals))
            write_obj(cv, cf, os.path.join(results, stem + suffix))
