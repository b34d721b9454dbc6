"""Streaming sharded datasets with host-overlap prefetch.

The reference pickles the ENTIRE training set into one file and unpickles it
fully into memory (preprocess.py:33-34, train.py:1901-1906) — fine for tens
of meshes, impossible for production corpora. This module scales the input
pipeline:

- :func:`save_sharded` / :class:`ShardedDataset` — the dataset is split into
  independently-loadable npz shards with a JSON index; training touches only
  the shards it samples (LRU-cached), so the working set stays bounded;
- :class:`PrefetchLoader` — a background thread samples patches, runs the
  host-side graph prep, and stages device arrays ahead of the training loop
  (double-buffered queue), overlapping host work and H2D transfer with the
  device step — the streaming analogue of the trainer's stacked-scan path.
"""

from __future__ import annotations

import collections
import json
import os
import queue
import threading
from typing import Callable, List, Optional, Tuple

import numpy as np

from facet_graph_convolution_tpu.data.dataset import (
    MeshDataset,
    load_dataset,
    save_dataset,
)


def save_sharded(ds: MeshDataset, out_dir: str, patches_per_shard: int = 32) -> int:
    """Split a dataset into npz shards + ``index.json``; returns shard count."""
    os.makedirs(out_dir, exist_ok=True)
    num = len(ds.patches)
    shards = []
    for si, start in enumerate(range(0, num, patches_per_shard)):
        sub = MeshDataset(
            max_patch_size=ds.max_patch_size,
            coarsening_steps=ds.coarsening_steps,
            coarsening_levels=ds.coarsening_levels,
            k_faces=ds.k_faces,
        )
        sub.patches = ds.patches[start:start + patches_per_shard]
        name = f"shard_{si:05d}.npz"
        save_dataset(sub, os.path.join(out_dir, name))
        shards.append({"file": name, "num_patches": len(sub.patches)})
    with open(os.path.join(out_dir, "index.json"), "w") as fh:
        json.dump(
            {
                "num_patches": num,
                "patches_per_shard": patches_per_shard,
                # lets streaming consumers pick ONE bucket for scan-stacking
                # without touching any shard
                "max_num_nodes": max((p.num_nodes for p in ds.patches),
                                     default=0),
                "shards": shards,
            },
            fh,
            indent=2,
        )
    return len(shards)


class ShardedDataset:
    """Lazy view over a :func:`save_sharded` directory: patches load on
    demand, keeping at most ``cache_shards`` shards in memory."""

    def __init__(self, shard_dir: str, cache_shards: int = 2):
        self.shard_dir = shard_dir
        with open(os.path.join(shard_dir, "index.json")) as fh:
            self.index = json.load(fh)
        self.num_patches = self.index["num_patches"]
        self._locate: List[Tuple[int, int]] = []
        for si, shard in enumerate(self.index["shards"]):
            for li in range(shard["num_patches"]):
                self._locate.append((si, li))
        self._cache: "collections.OrderedDict[int, MeshDataset]" = (
            collections.OrderedDict()
        )
        self.cache_shards = cache_shards
        self._lock = threading.Lock()

    def __len__(self) -> int:
        return self.num_patches

    def _shard(self, si: int) -> MeshDataset:
        with self._lock:
            if si in self._cache:
                self._cache.move_to_end(si)
                return self._cache[si]
        loaded = load_dataset(
            os.path.join(self.shard_dir, self.index["shards"][si]["file"])
        )
        with self._lock:
            self._cache[si] = loaded
            while len(self._cache) > self.cache_shards:
                self._cache.popitem(last=False)
        return loaded

    def patch(self, i: int):
        si, li = self._locate[i]
        return self._shard(si).patches[li]

    @property
    def max_num_nodes(self) -> int:
        """Largest patch size — from the index when present (save_sharded
        writes it), else computed by touching every shard once."""
        cached = self.index.get("max_num_nodes")
        if cached:
            return int(cached)
        best = 0
        for si in range(len(self.index["shards"])):
            best = max(best, max(p.num_nodes for p in self._shard(si).patches))
        self.index["max_num_nodes"] = best
        return best


class PrefetchLoader:
    """Background prefetch of prepared training items.

    ``prepare(patch, index)`` maps a raw patch (and its global index, a
    stable memoization key) to whatever the training step consumes
    (typically ``_patch_arrays`` after bucket padding, returning device
    arrays — building them on the loader thread overlaps host prep and H2D
    copies with the previous device step). ``depth`` bounds staged memory.

    Sampling is shard-aware: shards are visited in a fresh random order per
    epoch and each resident shard's patches are drained in shuffled order
    before the next shard loads — one shard decompression amortizes over all
    of its patches instead of one (uniform i.i.d. sampling over a large
    corpus would reload a shard for nearly every draw).
    """

    def __init__(
        self,
        dataset: ShardedDataset,
        prepare: Callable,
        seed: int = 0,
        depth: int = 2,
        num_items: Optional[int] = None,
        window: Optional[int] = None,
        collate: Optional[Callable] = None,
    ):
        self.dataset = dataset
        self.prepare = prepare
        self.num_items = num_items
        # window mode: gather `window` prepared items and hand the list to
        # `collate` ON THE LOADER THREAD (stacking + H2D staging overlap the
        # previous window's device execution); the queue then yields
        # (collated, count). The final window may be shorter.
        self.window = window
        self.collate = collate
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._rng = np.random.default_rng(seed)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _indices(self):
        """Yield patch indices forever: shuffled shards, shuffled within."""
        shards = self.dataset.index["shards"]
        starts = np.cumsum([0] + [s["num_patches"] for s in shards])
        while True:
            for si in self._rng.permutation(len(shards)):
                local = self._rng.permutation(shards[si]["num_patches"])
                for li in local:
                    yield int(starts[si] + li)

    def _run(self):
        produced = 0
        order = self._indices()
        pending = []
        try:
            while not self._stop.is_set():
                if self.num_items is not None and produced >= self.num_items:
                    if pending:
                        self._emit(self._collate(pending))
                    self._q.put(StopIteration)
                    return
                idx = next(order)
                item = self.prepare(self.dataset.patch(idx), idx)
                produced += 1
                if self.window is None:
                    self._emit(item)
                else:
                    pending.append(item)
                    if len(pending) == self.window:
                        self._emit(self._collate(pending))
                        pending = []
        except Exception as exc:                     # surface in the consumer
            self._q.put(exc)

    def _collate(self, items):
        batch = self.collate(items) if self.collate else list(items)
        return (batch, len(items))

    def _emit(self, item):
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.2)
                return
            except queue.Full:
                continue

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is StopIteration:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
