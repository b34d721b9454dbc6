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


def _process_one(task):
    """Worker: build a one-mesh TrainingSet (multiprocessing-safe)."""
    noisy_dir, gt_dir, filename, cfg_kwargs, with_vertices, redundancy, seed = task
    ds = TrainingSet(seed=seed, **cfg_kwargs)
    vertices, faces, _ = load_obj(noisy_dir, filename)
    gt_vertices, _, _ = load_obj(gt_dir, gt_filename(filename))
    for _ in range(redundancy):
        if with_vertices:
            ds.add_mesh_with_vertices(vertices, faces, gt_vertices)
        else:
            ds.add_mesh(vertices, faces, gt_vertices)
    return filename, ds


def _build_set(
    noisy_dir: str,
    gt_dir: str,
    cfg: Config,
    with_vertices: bool,
    seed: Optional[int] = None,
    num_workers: Optional[int] = None,
) -> TrainingSet:
    """Build a training set, one process per mesh (the reference preprocesses
    serially, preprocess.py:23-31; meshes are independent so this scales to
    host cores)."""
    cfg_kwargs = dict(
        max_patch_size=cfg.data.max_patch_size,
        coarsening_steps=cfg.model.coarsening_steps,
        coarsening_levels=cfg.model.coarsening_levels,
        k_faces=cfg.data.k_faces,
        k_vertices=cfg.data.k_vertices,
        max_edges=cfg.data.max_edges,
    )
    files = sorted(
        f for f in os.listdir(noisy_dir) if f.endswith(".obj")
    )
    base_seed = 0 if seed is None else seed
    tasks = [
        (noisy_dir, gt_dir, f, cfg_kwargs, with_vertices,
         cfg.data.training_data_redundancy, base_seed + i)
        for i, f in enumerate(files)
    ]

    ds = TrainingSet(seed=base_seed, **cfg_kwargs)
    if num_workers is None:
        num_workers = min(len(tasks), os.cpu_count() or 1, 16)
    t0 = time.time()
    if num_workers > 1 and len(tasks) > 1:
        import concurrent.futures as cf
        import multiprocessing as mp

        # spawn: never fork a process that may hold XLA/JAX threads
        with cf.ProcessPoolExecutor(
            max_workers=num_workers, mp_context=mp.get_context("spawn")
        ) as pool:
            for filename, part in pool.map(_process_one, tasks):
                ds.patches.extend(part.patches)
                print(f"added {filename} ({len(part.patches)} patches)")
    else:
        for task in tasks:
            filename, part = _process_one(task)
            ds.patches.extend(part.patches)
            print(f"added {filename} ({len(part.patches)} patches)")
    print(f"built {len(ds.patches)} patches in {time.time() - t0:.2f}s "
          f"({num_workers} workers)")
    return ds


def preprocess_directory(cfg: Optional[Config] = None,
                         with_vertices: Optional[bool] = None,
                         shard_size: Optional[int] = None):
    """Build and save training + validation datasets (reference
    ``pickleData``, preprocess.py:7-49). ``shard_size`` additionally writes
    the training set as streaming shards (data/stream.py) for
    ``train --stream_dir``."""
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
    if shard_size:
        from facet_graph_convolution_tpu.data.stream import save_sharded

        shard_dir = os.path.join(
            cfg.data.binary_dump_path, f"trainingShards{suffix}"
        )
        n = save_sharded(train, shard_dir, patches_per_shard=shard_size)
        print(f"saved {n} streaming shards → {shard_dir}")

    if os.path.isdir(cfg.data.valid_data_path) and os.listdir(cfg.data.valid_data_path):
        valid = _build_set(
            cfg.data.valid_data_path, cfg.data.gt_data_path, cfg, with_vertices
        )
        valid_path = os.path.join(cfg.data.binary_dump_path, f"validSet{suffix}.npz")
        save_dataset(valid, valid_path)
        print(f"saved {len(valid.patches)} validation patches → {valid_path}")
