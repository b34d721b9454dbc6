"""Whole-mesh sharded inference: no patch cutting, no overlap averaging.

The reference splits big meshes into BFS patches and averages overlapping
predictions (train.py:123-126) because one GPU cannot hold the whole graph.
With the halo-exchange runtime the full facet graph is edge-partitioned
across the device mesh and predicted in ONE exact forward pass —
shard boundaries reproduce the unsharded math (tests/test_parallel.py), so
there are no seams to average away.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from facet_graph_convolution_tpu.config import Config
from facet_graph_convolution_tpu.data.dataset import (
    MeshDataset,
    bucket_size,
    pad_patch_to,
)
from facet_graph_convolution_tpu.geometry.mesh_math import normalize_rows
from facet_graph_convolution_tpu.ops.vertex_update import update_positions_edges
from facet_graph_convolution_tpu.parallel.halo import (
    build_partition,
    sharded_unet_apply,
)
from facet_graph_convolution_tpu.parallel.mesh import make_mesh


def infer_normals_sharded(
    mesh_data: MeshDataset,
    cfg: Config,
    params,
    device_mesh: Optional[Mesh] = None,
    axis: str = "graph",
    solver_iterations: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Predict facet normals for a whole mesh across the device mesh, then
    refine vertices with the edge-map solver. ``mesh_data`` must have been
    built with ``max_patch_size ≥ F`` (one patch — the point of sharding is
    not to cut the mesh). Returns (vertices, normals) like
    :func:`facet_graph_convolution_tpu.inference.driver.infer_normals`.
    """
    assert len(mesh_data.patches) == 1, (
        "sharded inference takes the whole mesh as one patch; raise "
        "max_patch_size"
    )
    patch = mesh_data.patches[0]
    if device_mesh is None:
        device_mesh = make_mesh((1, len(jax.devices())), ("data", axis))
    n_dev = device_mesh.shape[axis]

    group = 2 ** cfg.model.coarsening_steps
    align = group ** (cfg.model.coarsening_levels - 1) * n_dev
    padded = pad_patch_to(patch, bucket_size(patch.num_nodes, align))
    part = build_partition(padded.adjs, n_dev)

    x = jnp.asarray(padded.inputs)
    with device_mesh:
        y = jax.jit(
            lambda p, xx: sharded_unet_apply(
                p, xx, part, device_mesh, axis=axis,
                coarsening_steps=cfg.model.coarsening_steps,
            )
        )(params, x)
    out = np.asarray(y)
    if patch.perm_inv is not None:
        out = out[patch.perm_inv]
    normals = normalize_rows(out[: patch.num_real].astype(np.float32))

    iters = solver_iterations or cfg.eval.solver_iterations
    from facet_graph_convolution_tpu.parallel.vertex_halo import (
        sharded_update_positions_edges,
    )

    refined = sharded_update_positions_edges(
        mesh_data.vertices,
        normals,
        mesh_data.edge_map,
        mesh_data.v_e_map,
        device_mesh,
        axis=axis,
        iter_num=iters,
        lmbd=(1.0 / 18.0 if cfg.eval.solver_lambda == "reference"
              else cfg.eval.solver_lambda),
        adaptive_tol=cfg.eval.solver_adaptive_tol,
        trust=cfg.eval.solver_trust,
    )
    return refined, normals


def infer_with_vertices_sharded(
    mesh_data: MeshDataset,
    cfg: Config,
    params,
    device_mesh: Optional[Mesh] = None,
    axis: str = "graph",
):
    """Fully multi-chip multi-scale inference (the sharded counterpart of
    :func:`facet_graph_convolution_tpu.inference.driver.infer_with_vertices`):
    halo-exchange forward with the three heads, then the sharded multi-scale
    vertex solver. Single whole-mesh patch only."""
    from facet_graph_convolution_tpu.ops.pooling import tree_unpool
    from facet_graph_convolution_tpu.ops.normalization import normalize_tensor
    from facet_graph_convolution_tpu.parallel.vertex_halo import (
        sharded_update_positions_multiscale,
    )

    assert len(mesh_data.patches) == 1, "whole-mesh sharded inference"
    patch = mesh_data.patches[0]
    if device_mesh is None:
        device_mesh = make_mesh((1, len(jax.devices())), ("data", axis))
    n_dev = device_mesh.shape[axis]

    group = 2 ** cfg.model.coarsening_steps
    align = group ** (cfg.model.coarsening_levels - 1) * n_dev
    padded = pad_patch_to(patch, bucket_size(patch.num_nodes, align))
    part = build_partition(padded.adjs, n_dev)

    x = jnp.asarray(padded.inputs)
    with device_mesh:
        n0, n1, n2 = jax.jit(
            lambda p, xx: sharded_unet_apply(
                p, xx, part, device_mesh, axis=axis,
                coarsening_steps=cfg.model.coarsening_steps, multi_scale=True,
            )
        )(params, x)

    # faces/v_faces come from the UNPADDED patch; solver normals match sizes
    fn_list = [
        np.asarray(n0)[: patch.num_nodes],
        np.asarray(n1)[: patch.num_nodes // group],
        np.asarray(n2)[: patch.num_nodes // group**2],
    ]
    refined, dx = sharded_update_positions_multiscale(
        patch.vertices, fn_list, patch.faces, patch.v_faces, device_mesh,
        axis=axis, coarsening_steps=cfg.model.coarsening_steps,
        iter_nums=cfg.eval.ms_solver_iterations,
    )
    refined_mid = refined - dx[2]
    refined_coarse = refined_mid - dx[1]

    steps = cfg.model.coarsening_steps
    up1 = np.asarray(normalize_tensor(tree_unpool(jnp.asarray(fn_list[1]), steps)))
    up2 = np.asarray(normalize_tensor(tree_unpool(jnp.asarray(fn_list[2]), 2 * steps)))

    def reorder(vals):
        out = vals[patch.perm_inv][: patch.num_real]
        return out

    return {
        "points": refined.astype(np.float32),
        "points_mid": refined_mid.astype(np.float32),
        "points_coarse": refined_coarse.astype(np.float32),
        "fine_normals": reorder(fn_list[0]),
        "mid_normals": reorder(up1),
        "coarse_normals": reorder(up2),
    }
