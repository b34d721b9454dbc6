"""Offline preprocessing: noisy/GT OBJ directories → .npz datasets.

Reference driver: ``preprocess.py:7-58`` (``pickleData``) — iterates noisy
meshes, maps GT filenames, builds the training/validation sets with
``TRAINING_DATA_REDUNDANCY`` repeats (randomized patching + coarsening makes
each repeat a different sample), serializes.
"""

from __future__ import annotations

import os
import time
from typing import Optional

from facet_graph_convolution_tpu.config import Config, default_config, gt_filename
from facet_graph_convolution_tpu.data.dataset import TrainingSet, save_dataset
from facet_graph_convolution_tpu.geometry import load_obj


def _build_set(
    noisy_dir: str,
    gt_dir: str,
    cfg: Config,
    with_vertices: bool,
    seed: Optional[int] = None,
) -> TrainingSet:
    ds = TrainingSet(
        max_patch_size=cfg.data.max_patch_size,
        coarsening_steps=cfg.model.coarsening_steps,
        coarsening_levels=cfg.model.coarsening_levels,
        k_faces=cfg.data.k_faces,
        k_vertices=cfg.data.k_vertices,
        max_edges=cfg.data.max_edges,
        seed=seed,
    )
    for filename in sorted(os.listdir(noisy_dir)):
        if not filename.endswith(".obj"):
            continue
        gt_name = gt_filename(filename)
        t0 = time.time()
        vertices, faces, _ = load_obj(noisy_dir, filename)
        gt_vertices, _, _ = load_obj(gt_dir, gt_name)
        for _ in range(cfg.data.training_data_redundancy):
            if with_vertices:
                ds.add_mesh_with_vertices(vertices, faces, gt_vertices)
            else:
                ds.add_mesh(vertices, faces, gt_vertices)
        print(
            f"added {filename} ({faces.shape[0]} faces, "
            f"{len(ds.patches)} patches total, {time.time() - t0:.2f}s)"
        )
    return ds


def preprocess_directory(cfg: Optional[Config] = None, with_vertices: Optional[bool] = None):
    """Build and save training + validation datasets (reference
    ``pickleData``, preprocess.py:7-49)."""
    cfg = cfg or default_config()
    if with_vertices is None:
        with_vertices = cfg.model.include_vertices
    os.makedirs(cfg.data.binary_dump_path, exist_ok=True)
    suffix = "WithVertices" if with_vertices else ""

    train = _build_set(
        cfg.data.training_data_path, cfg.data.gt_data_path, cfg, with_vertices
    )
    train_path = os.path.join(cfg.data.binary_dump_path, f"trainingSet{suffix}.npz")
    save_dataset(train, train_path)
    print(f"saved {len(train.patches)} training patches → {train_path}")

    if os.path.isdir(cfg.data.valid_data_path) and os.listdir(cfg.data.valid_data_path):
        valid = _build_set(
            cfg.data.valid_data_path, cfg.data.gt_data_path, cfg, with_vertices
        )
        valid_path = os.path.join(cfg.data.binary_dump_path, f"validSet{suffix}.npz")
        save_dataset(valid, valid_path)
        print(f"saved {len(valid.patches)} validation patches → {valid_path}")
