"""Data pipeline tests: patch building, coarsening retry, serialization,
bucket padding."""

import numpy as np
import pytest

from facet_graph_convolution_tpu.data.dataset import (
    InferenceMesh,
    MeshDataset,
    TrainingSet,
    bucket_size,
    load_dataset,
    pad_patch_to,
    save_dataset,
)
from facet_graph_convolution_tpu.geometry import compute_face_normals
from tests.conftest import make_icosphere


def build_small_set(with_gt=True, levels=3, seed=0):
    v, f = make_icosphere(2)          # 320 faces
    noisy = v + np.random.default_rng(1).normal(scale=0.01, size=v.shape).astype(np.float32)
    ds = TrainingSet(
        max_patch_size=20000, coarsening_steps=2, coarsening_levels=levels,
        k_faces=23, seed=seed,
    )
    ds.add_mesh(noisy, f, gt_vertices=v if with_gt else None)
    return ds, v, f


def test_small_mesh_single_patch():
    ds, v, f = build_small_set()
    assert len(ds.patches) == 1
    p = ds.patches[0]
    assert p.num_real == f.shape[0]
    # binary pyramid: fine nodes multiple of 16
    assert p.num_nodes % 16 == 0
    assert len(p.adjs) == 3
    assert p.adjs[1].shape[0] == p.num_nodes // 4
    assert p.adjs[2].shape[0] == p.num_nodes // 16
    # fake nodes zero-signalled
    fake_mask = np.ones(p.num_nodes, bool)
    fake_mask[p.perm_inv[: p.num_real]] = False
    assert np.allclose(p.inputs[fake_mask], 0.0)
    assert np.allclose(p.gt_normals[fake_mask], 0.0)
    # real signals survive the permutation round trip
    orig = p.inputs[p.perm_inv[: p.num_real]]
    noisy_normals = orig[:, :3]
    assert np.all(np.abs(np.linalg.norm(noisy_normals, axis=1) - 1.0) < 1e-3)


def test_patch_splitting_covers_mesh():
    v, f = make_icosphere(3)          # 1280 faces
    ds = TrainingSet(
        max_patch_size=500, coarsening_steps=2, coarsening_levels=3,
        k_faces=23, seed=0,
    )
    ds.min_patch_size = 200
    ds.add_mesh(v, f, gt_vertices=v)
    assert len(ds.patches) >= 2
    covered = np.unique(np.concatenate([p.patch_indices for p in ds.patches]))
    assert covered.size == f.shape[0]


def test_one_level_dataset():
    ds, _, f = build_small_set(levels=1)
    p = ds.patches[0]
    assert len(p.adjs) == 1
    assert p.num_nodes == f.shape[0]
    assert p.perm_inv is None


def test_dataset_roundtrip(tmp_path):
    ds, _, _ = build_small_set()
    path = str(tmp_path / "ds.npz")
    save_dataset(ds, path)
    loaded = load_dataset(path)
    assert len(loaded.patches) == len(ds.patches)
    p0, p1 = ds.patches[0], loaded.patches[0]
    np.testing.assert_array_equal(p0.inputs, p1.inputs)
    np.testing.assert_array_equal(p0.gt_normals, p1.gt_normals)
    for a0, a1 in zip(p0.adjs, p1.adjs):
        np.testing.assert_array_equal(a0, a1)
    assert p0.num_real == p1.num_real


def test_vertex_pipeline():
    v, f = make_icosphere(2)
    ds = TrainingSet(
        max_patch_size=20000, coarsening_steps=2, coarsening_levels=3,
        k_faces=23, seed=0,
    )
    ds.add_mesh_with_vertices(v, f, gt_vertices=v)
    p = ds.patches[0]
    assert p.vertices is not None and p.faces is not None
    assert p.faces.shape[0] == p.num_nodes
    # tree-ordered faces: fake rows are -1
    real_rows = np.flatnonzero(p.faces[:, 0] >= 0)
    assert real_rows.size == p.num_real
    assert p.v_faces.shape[0] == p.vertices.shape[0]
    # vertices normalized by joint bbox diagonal
    assert np.linalg.norm(p.vertices.max(0) - p.vertices.min(0)) <= 1.0 + 1e-5


def test_inference_mesh_keeps_whole():
    v, f = make_icosphere(2)
    mesh = InferenceMesh(
        max_patch_size=20000, coarsening_steps=2, coarsening_levels=3, k_faces=23
    )
    mesh.add_mesh(v, f)
    assert mesh.vertices.shape == v.shape
    assert mesh.edge_map is not None
    assert mesh.normals.shape == (f.shape[0], 3)


def test_pad_patch_to():
    ds, _, _ = build_small_set()
    p = ds.patches[0]
    target = bucket_size(p.num_nodes, 512)
    padded = pad_patch_to(p, target)
    assert padded.num_nodes == target
    assert padded.adjs[1].shape[0] == target // 4
    assert padded.adjs[2].shape[0] == target // 16
    np.testing.assert_array_equal(padded.inputs[: p.num_nodes], p.inputs)
    assert np.allclose(padded.inputs[p.num_nodes:], 0.0)
    # pad rows are self-only
    pad_rows = padded.adjs[0][p.num_nodes:]
    np.testing.assert_array_equal(
        pad_rows[:, 0], np.arange(p.num_nodes, target) + 1
    )
    assert np.all(pad_rows[:, 1:] == 0)


def test_parallel_preprocessing(tmp_path):
    """Multi-mesh preprocessing fans out over processes and aggregates."""
    import os

    from facet_graph_convolution_tpu.config import default_config
    from facet_graph_convolution_tpu.data.preprocess import _build_set
    from facet_graph_convolution_tpu.geometry import write_obj

    cfg = default_config(str(tmp_path) + "/")
    os.makedirs(cfg.data.training_data_path, exist_ok=True)
    os.makedirs(cfg.data.gt_data_path, exist_ok=True)
    v, f = make_icosphere(2)
    rng = np.random.default_rng(0)
    for i in range(3):
        write_obj(v, f, os.path.join(cfg.data.gt_data_path, f"m{i}.obj"))
        noisy = (v + rng.normal(scale=0.02, size=v.shape)).astype(np.float32)
        write_obj(noisy, f, os.path.join(cfg.data.training_data_path, f"m{i}_n1.obj"))

    ds = _build_set(cfg.data.training_data_path, cfg.data.gt_data_path, cfg,
                    with_vertices=False, num_workers=3)
    assert len(ds.patches) == 3
    for p in ds.patches:
        assert p.gt_normals is not None
        assert p.num_real == f.shape[0]
