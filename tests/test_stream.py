"""Sharded streaming dataset + prefetch loader + streaming trainer."""

import numpy as np

from __graft_entry__ import _make_patch
from facet_graph_convolution_tpu.config import default_config
from facet_graph_convolution_tpu.data.dataset import MeshDataset
from facet_graph_convolution_tpu.data.stream import (
    PrefetchLoader,
    ShardedDataset,
    save_sharded,
)


def _dataset(n_patches=5):
    ds = MeshDataset(max_patch_size=20000, coarsening_steps=2,
                     coarsening_levels=3)
    for i in range(n_patches):
        ds.patches.append(_make_patch(subdiv=2, seed=i))
    return ds


def test_shard_roundtrip(tmp_path):
    ds = _dataset(5)
    n_shards = save_sharded(ds, str(tmp_path), patches_per_shard=2)
    assert n_shards == 3

    sharded = ShardedDataset(str(tmp_path), cache_shards=1)
    assert len(sharded) == 5
    for i in range(5):
        p = sharded.patch(i)
        np.testing.assert_array_equal(p.inputs, ds.patches[i].inputs)
        for a, b in zip(p.adjs, ds.patches[i].adjs):
            np.testing.assert_array_equal(a, b)
        assert p.num_real == ds.patches[i].num_real
    # LRU keeps at most cache_shards shards resident
    assert len(sharded._cache) == 1


def test_prefetch_loader_delivers_and_stops(tmp_path):
    ds = _dataset(3)
    save_sharded(ds, str(tmp_path), patches_per_shard=2)
    sharded = ShardedDataset(str(tmp_path))

    seen = []
    loader = PrefetchLoader(sharded, lambda p, i: (i, p.num_real), seed=1,
                            depth=2, num_items=7)
    for item in loader:
        seen.append(item)
    assert len(seen) == 7
    valid = {p.num_real for p in ds.patches}
    assert {v for _, v in seen} <= valid
    # shard-aware order: indices must be consistent with their patches
    for i, v in seen:
        assert ds.patches[i].num_real == v


def test_prefetch_loader_surfaces_errors(tmp_path):
    ds = _dataset(2)
    save_sharded(ds, str(tmp_path))
    sharded = ShardedDataset(str(tmp_path))

    def boom(_, __):
        raise ValueError("prep failed")

    loader = PrefetchLoader(sharded, boom, num_items=1)
    try:
        next(loader)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_streaming_training_converges(tmp_path):
    from facet_graph_convolution_tpu.training.trainer import (
        train_normals_streaming,
    )

    ds = _dataset(2)
    shard_dir = tmp_path / "shards"
    save_sharded(ds, str(shard_dir))
    cfg = default_config().replace(
        train={
            "network_path": str(tmp_path / "net") + "/",
            "net_name": "stream",
            "eval_every": 40,
        }
    )
    state, hist = train_normals_streaming(
        cfg, str(shard_dir), num_iterations=80, bucket_align=256
    )
    # same artifact contract as train_normals: (train, valid) rows at each
    # eval_every tick, CSV written next to the checkpoint
    assert hist.ndim == 2 and hist.shape[1] == 2
    assert hist[-1, 0] < hist[0, 0]
    import os
    assert os.path.isfile(str(tmp_path / "net") + "/stream.csv")


def test_streaming_windowed_scan_path(tmp_path):
    """steps_per_call > 1: windows of prepared patches are stacked on the
    loader thread and scanned in one dispatch; partial final window runs
    per-step; artifacts match the per-step contract."""
    from facet_graph_convolution_tpu.training.trainer import (
        train_normals_streaming,
    )

    ds = _dataset(3)
    shard_dir = tmp_path / "shards"
    save_sharded(ds, str(shard_dir), patches_per_shard=2)
    cfg = default_config().replace(
        train={
            "network_path": str(tmp_path / "net") + "/",
            "net_name": "streamw",
            "eval_every": 8,
        }
    )
    # 18 = 2 full windows of 8 + a partial window of 2
    state, hist = train_normals_streaming(
        cfg, str(shard_dir), num_iterations=18, bucket_align=256,
        steps_per_call=8,
    )
    assert hist.ndim == 2 and hist.shape[1] == 2
    assert np.isfinite(hist[:, 0]).all()
    import os
    assert os.path.isfile(str(tmp_path / "net") + "/streamw.csv")
    # the index records the dataset-wide bucket source
    sharded = ShardedDataset(str(shard_dir))
    assert sharded.max_num_nodes == max(p.num_nodes for p in ds.patches)
