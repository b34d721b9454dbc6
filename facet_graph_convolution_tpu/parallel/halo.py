"""Edge-partitioned facet-graph execution with per-layer halo exchange.

ONE large facet graph is node-partitioned into D contiguous blocks (the
binary-tree/BFS ordering gives spatial locality, so the adjacency is close to
banded and cross-shard edges overwhelmingly connect nearby shards). Each
shard owns its nodes' full K-lists, so degree normalization is globally
exact; neighbour features living on other shards (the *halo*) are fetched
once per conv layer with ``ppermute`` ring hops inside ``shard_map`` — the
graph-world analogue of ring attention's neighbour exchange, and the
replacement for the reference's lossy patch-overlap averaging
(train.py:123-126; SURVEY.md §5).

Correctness contract (tested): the sharded forward reproduces the
single-device forward bit-for-bit up to float tolerance, including fake-node
masking, bias masking, and the global mean in ``normalize_tensor``.

Partition boundaries are aligned to ``(2^steps)^(levels-1)`` so every
coarsening level of the pyramid splits at sibling-group boundaries and tree
pooling stays shard-local.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from facet_graph_convolution_tpu.config import Config
from facet_graph_convolution_tpu.models.losses import _fake_node_mask
from facet_graph_convolution_tpu.ops.conv import (
    FacetConvVariant,
    _aggregate_nminor,
)
from facet_graph_convolution_tpu.ops.normalization import lrelu
from facet_graph_convolution_tpu.ops.pooling import (
    tree_pool,
    tree_pool_nminor,
    tree_unpool,
    tree_unpool_nminor,
)
from facet_graph_convolution_tpu.training.trainer import TrainState

# Windowed levels run the FUSED slab conv (ops.windowed_conv) instead of the
# gather-then-aggregate pipeline — measured HBM-traffic win at the
# million-facet regime (BASELINE.md round 4). Module-level so A/B benches
# and tests can flip it; env override for the tools.
_WINDOWED_FUSED = os.environ.get("FGC_WINDOWED_FUSED", "1") != "0"


# ---------------------------------------------------------------------------
# Host-side partitioner
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class LevelPartition:
    """One pyramid level, split into D equal blocks.

    - ``local_adj`` [D, n, K]: K-lists with entries remapped into the
      shard-extended index space — one-indexed; 1..n are owned nodes,
      n+1..n+H are halo slots, 0 is padding;
    - ``send_idx`` [D, num_offsets, H]: for ring offset ``offsets[j]``, the
      owned-row indices shard s must send to shard s − offsets[j] (packed in
      the receiver's expected order; −1 = inactive slot → sends row 0 whose
      content the receiver never reads);
    - ``recv_mask`` [D, num_offsets, H]: 1 where the received slot is a real
      requested row.

    DCN-aware split (``devices_per_host`` set at build time): the per-offset
    ring tables then carry only *intra-host* halo traffic (ICI hops on a
    process-contiguous mesh — parallel/distributed.make_multihost_mesh), and
    all *cross-host* rows are batched into per-(src, dst) pair tables
    exchanged in ONE ``all_to_all`` per layer — one DCN transfer instead of
    one per ring offset:

    - ``cross_send`` [D, D, Hx]: rows shard s sends to shard t (local
      indices on s, packed in t's expected order; 0-filled when inactive);
    - ``cross_mask`` [D, D, Hx]: on the receiver — 1 where the slot received
      from source shard o is a real requested row.
    """

    num_nodes: int
    block: int                       # n = num_nodes / D
    offsets: Tuple[int, ...]         # ring offsets (nonzero, e.g. (1, -1, 2))
    local_adj: np.ndarray            # [D, n, K'] deduped, neighbours-only
    local_adj_t: np.ndarray          # [D, ext, K_t] transpose slot maps
    lane_adj: np.ndarray             # [D, K', n] transposed K-lists (lane gather)
    lane_adj_t: np.ndarray           # [D, K_tl, ext] lane slot maps (node minor)
    send_idx: np.ndarray
    recv_mask: np.ndarray
    halo_size: int                   # H per offset (uniform, padded)
    mult: np.ndarray                 # [D, n, K'] slot multiplicities
    self_mult: np.ndarray            # [D, n] self-slot multiplicity
    cross_send: Optional[np.ndarray] = None   # [D, D, Hx]
    cross_mask: Optional[np.ndarray] = None   # [D, D, Hx]
    cross_halo: int = 0


@dataclasses.dataclass
class GraphPartition:
    num_shards: int
    levels: List[LevelPartition]
    # windowed_lane_tables results keyed by (level, block) — the build runs a
    # full [S, N] transpose-table pass per level, so it must not repeat per
    # make_sharded_train_step / sharded_unet_apply call (advisor r3)
    _window_cache: Dict = dataclasses.field(
        default_factory=dict, repr=False, compare=False
    )

    @property
    def fine(self) -> LevelPartition:
        return self.levels[0]


@dataclasses.dataclass(frozen=True)
class LevelGeometry:
    """Shape signature of one LevelPartition — the static geometry a compiled
    sharded step depends on. Partitioning DIFFERENT meshes with a merged
    (elementwise-max / offset-union) geometry yields identically-shaped
    tables, so one jitted step serves them all (multi-mesh training without
    per-mesh recompiles; ``train_normals_sharded_multi``)."""

    offsets: Tuple[int, ...]
    halo: int
    cross_halo: int
    use_cross: bool
    k_n: int                         # deduped neighbours-only K width
    k_t: int                         # row-major transpose slot width
    k_tl: int                        # lane slot-map width


def level_geometry(lvl: LevelPartition) -> LevelGeometry:
    return LevelGeometry(
        offsets=tuple(lvl.offsets),
        halo=lvl.halo_size,
        cross_halo=lvl.cross_halo,
        use_cross=lvl.cross_send is not None,
        k_n=lvl.local_adj.shape[2],
        k_t=lvl.local_adj_t.shape[2],
        k_tl=lvl.lane_adj_t.shape[1],
    )


def merge_geometry(a: LevelGeometry, b: LevelGeometry) -> LevelGeometry:
    assert a.use_cross == b.use_cross, (
        "cannot merge a ring-exchange level with an all_to_all level — "
        "build both partitions with the same exchange mode"
    )
    return LevelGeometry(
        offsets=tuple(sorted(set(a.offsets) | set(b.offsets),
                             key=lambda d: (abs(d), d))),
        halo=max(a.halo, b.halo),
        cross_halo=max(a.cross_halo, b.cross_halo),
        use_cross=a.use_cross,
        k_n=max(a.k_n, b.k_n),
        k_t=max(a.k_t, b.k_t),
        k_tl=max(a.k_tl, b.k_tl),
    )


def _partition_level(
    adj: np.ndarray, num_shards: int, devices_per_host: Optional[int] = None,
    geometry: Optional[LevelGeometry] = None,
) -> LevelPartition:
    n_total, k = adj.shape
    assert n_total % num_shards == 0, (n_total, num_shards)
    block = n_total // num_shards
    owner = lambda g: g // block
    # host-aware mode: shard s lives on host s // dph (process-contiguous
    # mesh ordering, parallel/distributed.make_multihost_mesh); remote rows
    # owned by a different host are exchanged via the batched all_to_all
    # tables instead of the per-offset ICI rings
    dph = devices_per_host if devices_per_host and devices_per_host < num_shards else None
    host_of = (lambda sh: sh // dph) if dph else (lambda sh: 0)

    neigh = adj.astype(np.int64) - 1                     # -1 = pad
    # per shard: remote global ids needed — intra-host grouped by owner
    # offset, cross-host grouped by source shard (all-vectorized: unique +
    # owner-boundary splits; no per-edge Python)
    requested: List[Dict[int, np.ndarray]] = []
    cross_req: List[Dict[int, np.ndarray]] = []
    offsets_set = set()
    for s in range(num_shards):
        rows = neigh[s * block : (s + 1) * block]
        valid = rows[rows >= 0]
        remote = np.unique(valid[(valid < s * block) | (valid >= (s + 1) * block)])
        groups: Dict[int, np.ndarray] = {}
        xgroups: Dict[int, np.ndarray] = {}
        owners = remote // block
        # remote is sorted, hence owners is non-decreasing: split at owner
        # boundaries instead of one masked scan per owner
        bounds = np.searchsorted(owners, np.arange(num_shards + 1))
        for o in np.unique(owners):
            o = int(o)
            rows_o = remote[bounds[o] : bounds[o + 1]]
            if dph and host_of(o) != host_of(s):
                xgroups[o] = rows_o
            else:
                groups[o - s] = rows_o
                offsets_set.add(o - s)
        requested.append(groups)
        cross_req.append(xgroups)

    offsets = tuple(sorted(offsets_set, key=lambda d: (abs(d), d)))
    if geometry is not None:
        assert offsets_set <= set(geometry.offsets), (
            "forced geometry is missing ring offsets this mesh needs",
            sorted(offsets_set - set(geometry.offsets)),
        )
        assert geometry.use_cross == bool(dph), (
            "forced geometry exchange mode mismatch"
        )
        offsets = geometry.offsets
    halo = 0
    for s in range(num_shards):
        for d in offsets:
            halo = max(halo, len(requested[s].get(d, ())))
    halo = max(halo, 1)
    if geometry is not None:
        halo = max(halo, geometry.halo)
    num_off = max(len(offsets), 1)
    cross_halo = 0
    for s in range(num_shards):
        for o, rows_o in cross_req[s].items():
            cross_halo = max(cross_halo, len(rows_o))
    if dph:
        cross_halo = max(cross_halo, 1)
    if geometry is not None:
        cross_halo = max(cross_halo, geometry.cross_halo)

    send_idx = np.full((num_shards, num_off, halo), -1, dtype=np.int32)
    recv_mask = np.zeros((num_shards, num_off, halo), dtype=np.float32)
    cross_send = (
        np.zeros((num_shards, num_shards, cross_halo), dtype=np.int32)
        if dph else None
    )
    cross_mask = (
        np.zeros((num_shards, num_shards, cross_halo), dtype=np.float32)
        if dph else None
    )
    local_adj = np.zeros((num_shards, block, k), dtype=np.int32)

    # dense global→extended-slot remap, reused across shards: each shard
    # refills exactly the positions it will read (its own requested ids), so
    # stale entries from earlier shards are never consulted. Replaces the
    # per-remote-edge dict lookup loop — at 2M facets × 4 levels that loop
    # was minutes of preprocessing (VERDICT round-2 weak item 2).
    slot_map = np.zeros(n_total, dtype=np.int64)
    for s in range(num_shards):
        # halo slot map for shard s: offset j's rows land at
        # [j*halo, j*halo+|req|); cross-host rows from source o land after
        # the intra region at [num_off*halo + o*cross_halo, ... + |req|)
        for j, d in enumerate(offsets):
            req = requested[s].get(d, np.zeros(0, np.int64))
            slot_map[req] = block + j * halo + np.arange(len(req))
            recv_mask[s, j, : len(req)] = 1.0
            # the sender is shard s + d; its send list for offset d towards s
            # is filled below from the receiver's perspective
        # fill sender tables: shard s RECEIVES from s+d ⇒ shard (s+d) sends
        for j, d in enumerate(offsets):
            src = s + d
            if 0 <= src < num_shards:
                req = requested[s].get(d, np.zeros(0, np.int64))
                send_idx[src, j, : len(req)] = req - src * block
        if dph:
            base = block + len(offsets) * halo
            for o, req in cross_req[s].items():
                slot_map[req] = base + o * cross_halo + np.arange(len(req))
                cross_mask[s, o, : len(req)] = 1.0
                # source shard o sends these rows (its local indices) to s
                cross_send[o, s, : len(req)] = req - o * block

        rows = neigh[s * block : (s + 1) * block]
        out = np.zeros_like(rows)
        own_mask = (rows >= s * block) & (rows < (s + 1) * block)
        out[own_mask] = rows[own_mask] - s * block + 1
        remote_mask = (rows >= 0) & ~own_mask
        out[remote_mask] = slot_map[rows[remote_mask]] + 1
        local_adj[s] = out

    # dedupe duplicate K-list slots into multiplicities and split the self
    # slot out (its features are the local row — no gather) per shard, the
    # same exact transformations as the single-chip fast path
    # (graph.convert.dedupe_klist / split_self_klist); degree = mult sums
    # stays the original non-zero count, so global normalization is exact
    from facet_graph_convolution_tpu.graph.convert import (
        dedupe_klist,
        split_self_klist,
        transpose_adjacency,
    )

    nbrs, mults, selfs = [], [], []
    for s in range(num_shards):
        a_u, mlt = dedupe_klist(local_adj[s])
        nbr, m_n, s_m = split_self_klist(a_u, mlt)
        nbrs.append(nbr)
        mults.append(m_n)
        selfs.append(s_m)
    k_n = max(a.shape[1] for a in nbrs)
    if geometry is not None:
        k_n = max(k_n, geometry.k_n)
    local_adj = np.zeros((num_shards, block, k_n), dtype=np.int32)
    mult = np.zeros((num_shards, block, k_n), dtype=np.float32)
    for s in range(num_shards):
        local_adj[s, :, : nbrs[s].shape[1]] = nbrs[s]
        mult[s, :, : mults[s].shape[1]] = mults[s]
    self_mult = np.stack(selfs)

    # transpose slot maps over the halo-extended index space, for the
    # scatter-free gather backward inside each shard — sized by the ACTUAL
    # offset count (len(offsets) can be 0, e.g. D=1 overhead benchmarks,
    # while the table arrays keep a min width of 1 for structural reasons)
    ext = block + len(offsets) * halo + (num_shards * cross_halo if dph else 0)
    t_maps = [transpose_adjacency(local_adj[s], num_targets=ext)
              for s in range(num_shards)]
    k_t = max(t.shape[1] for t in t_maps)
    if geometry is not None:
        k_t = max(k_t, geometry.k_t)
    local_adj_t = np.zeros((num_shards, ext, k_t), dtype=np.int32)
    for s, t in enumerate(t_maps):
        local_adj_t[s, :, : t.shape[1]] = t

    # lane-axis gather tables (the single-chip fast path's layout win —
    # BASELINE.md 45.1M → 50.2M): transposed K-lists + lane slot maps over
    # the extended index space
    from facet_graph_convolution_tpu.graph.convert import lane_tables

    lane_pairs = [lane_tables(local_adj[s], num_sources=ext)
                  for s in range(num_shards)]
    lane_adj = np.stack([p[0] for p in lane_pairs])
    # lane slot maps are [K_t, ext] (node axis minor — see lane_tables)
    k_tl = max(p[1].shape[0] for p in lane_pairs)
    if geometry is not None:
        k_tl = max(k_tl, geometry.k_tl)
    lane_adj_t = np.zeros((num_shards, k_tl, ext), dtype=np.int32)
    for s, (_, t) in enumerate(lane_pairs):
        lane_adj_t[s, : t.shape[0], :] = t

    return LevelPartition(
        num_nodes=n_total,
        block=block,
        offsets=offsets,
        local_adj=local_adj,
        local_adj_t=local_adj_t,
        lane_adj=lane_adj,
        lane_adj_t=lane_adj_t,
        send_idx=send_idx.clip(min=0),  # -1 → 0 (sends row 0; receiver masks)
        recv_mask=recv_mask,
        halo_size=halo,
        mult=mult,
        self_mult=self_mult,
        cross_send=cross_send,
        cross_mask=cross_mask,
        cross_halo=cross_halo if dph else 0,
    )


def build_partition(
    adjs: Sequence[np.ndarray],
    num_shards: int,
    devices_per_host: Optional[int] = None,
    exchange: str = "auto",
    geometry: Optional[Sequence[Optional[LevelGeometry]]] = None,
) -> GraphPartition:
    """Partition a coarsening pyramid for D shards. The fine level size must
    be divisible by D × (coarsening group)^(levels−1) so every level splits
    evenly (use :func:`facet_graph_convolution_tpu.data.dataset.pad_patch_to`
    first).

    ``devices_per_host`` (multi-host meshes, parallel/distributed) splits the
    halo traffic: intra-host rows ride the per-offset ``ppermute`` rings
    (ICI); cross-host rows batch into one ``all_to_all`` per conv layer (one
    DCN transfer instead of one per ring offset).

    ``exchange`` picks the single-host collective shape per level:
    ``"rings"`` = one ppermute per ring offset; ``"a2a"`` = batch ALL halo
    traffic into one ``all_to_all`` per layer; ``"auto"`` (default) uses the
    a2a form when the ring offsets span at least half the shards — the
    Graclus tree ordering often spreads neighbours across every shard, where
    N nearly-all-pairs ppermutes cost far more than one all_to_all (measured
    −33% step time on the 8-device virtual mesh, bit-identical results)."""
    levels = []
    for i, a in enumerate(adjs):
        a = np.asarray(a)
        if geometry is not None and geometry[i] is not None:
            # forced geometry pins the per-level shapes AND the exchange
            # mode (use_cross ⇒ batched a2a tables), overriding ``exchange``
            geo = geometry[i]
            dph = devices_per_host if devices_per_host is not None else (
                1 if geo.use_cross else None
            )
            lvl = _partition_level(a, num_shards, dph, geometry=geo)
        elif devices_per_host is not None:
            lvl = _partition_level(a, num_shards, devices_per_host)
        elif exchange == "a2a":
            lvl = _partition_level(a, num_shards, 1)
        else:
            lvl = _partition_level(a, num_shards, None)
            if (exchange == "auto" and num_shards > 2
                    and len(lvl.offsets) >= max(2, num_shards // 2)):
                lvl = _partition_level(a, num_shards, 1)
        levels.append(lvl)
    return GraphPartition(num_shards=num_shards, levels=levels)


def _cross_entries(lvl: LevelPartition):
    """Cross-host all_to_all tables — appended to the operand tuple only on
    host-aware partitions (build_partition(devices_per_host=...))."""
    if lvl.cross_send is None:
        return ()
    return (jnp.asarray(lvl.cross_send), jnp.asarray(lvl.cross_mask))


def partition_operands(part: GraphPartition):
    """Per-level device operands:
    (local_adj, local_adj_t, send_idx, recv_mask, mult, self_mult
    [, cross_send, cross_mask]) tuples."""
    return tuple(
        (
            jnp.asarray(lvl.local_adj),
            jnp.asarray(lvl.local_adj_t),
            jnp.asarray(lvl.send_idx),
            jnp.asarray(lvl.recv_mask),
            jnp.asarray(lvl.mult),
            jnp.asarray(lvl.self_mult),
        )
        + _cross_entries(lvl)
        for lvl in part.levels
    )


def partition_operands_nminor(part: GraphPartition, windows=None):
    """Per-level device operands for the node-minor sharded conv:
    (local_adj, local_adj_t, send_idx, recv_mask, mult_rows) tuples, where
    ``mult_rows`` [D, K+1, n] is the fused per-slot multiplicity × 1/degree
    (slot 0 = self; graph.convert.fused_mult_rows) per shard.

    ``windows`` (from :func:`build_level_windows`) swaps a level onto the
    windowed gather: its table arrays (7, or 11 with the D>1 halo-tail
    pack) are appended after ``mult_rows`` — with the cross (batched-a2a)
    entries, when the level has them, in between — and the flat lane
    tables are replaced by per-shard dummies (the windowed conv never
    reads them; the flat tables would otherwise pin ~130 MB of unused HBM
    per million-node level). The conv derives the layout from the static
    window geometry + len(ops)."""
    from facet_graph_convolution_tpu.graph.convert import fused_mult_rows

    ops = []
    for i, lvl in enumerate(part.levels):
        rows = np.stack(
            [
                fused_mult_rows(lvl.mult[s], lvl.self_mult[s])
                for s in range(lvl.mult.shape[0])
            ]
        )
        wt = windows[i] if windows is not None else None
        if wt is not None:
            has_halo = len(lvl.offsets) > 0 or lvl.cross_send is not None
            assert wt.has_tail == has_halo, (
                "windowed tables' tail pack must match the level's halo"
            )
            dummy = jnp.zeros((part.num_shards, 1, 1), jnp.int32)
            wt_arrays = (
                tuple(jnp.asarray(a) for a in wt.arrays)
                if part.num_shards > 1
                else tuple(jnp.asarray(a)[None] for a in wt.arrays)
            )
            # cross (batched-a2a) entries, when present, sit between the
            # base 5 and the window pack — the conv derives their presence
            # from len(ops) vs the geometry's static pack size
            ops.append(
                (
                    dummy,
                    dummy,
                    jnp.asarray(lvl.send_idx),
                    jnp.asarray(lvl.recv_mask),
                    jnp.asarray(rows),
                )
                + _cross_entries(lvl)
                + wt_arrays
            )
        else:
            ops.append(
                (
                    jnp.asarray(lvl.lane_adj),
                    jnp.asarray(lvl.lane_adj_t),
                    jnp.asarray(lvl.send_idx),
                    jnp.asarray(lvl.recv_mask),
                    jnp.asarray(rows),
                )
                + _cross_entries(lvl)
            )
    return tuple(ops)


WINDOWED_MIN_NODES = int(os.environ.get("FGC_WINDOWED_MIN_NODES", 262144))
WINDOWED_BLOCK = int(os.environ.get("FGC_WINDOWED_BLOCK", 32768))


def build_level_windows(
    part: GraphPartition,
    min_nodes: Optional[int] = None,
    block: Optional[int] = None,
    variant: FacetConvVariant = FacetConvVariant.DEFAULT,
):
    """Per-level :class:`~facet_graph_convolution_tpu.graph.convert.WindowedLaneTables`
    (or None) for the windowed lane gather — the HBM-scale gather fast path
    (BASELINE.md round 3: the flat XLA gather degrades 1.9 → ~11 ns/row once
    the operand leaves the on-chip working set; per-block dynamic-slice
    windows over the RCM-ordered index space restore ~2.2-2.8 ns/row).

    A level qualifies when its per-shard block is big enough to be in the
    degraded regime (``min_nodes``) and the pyramid has index locality
    (``windowed_lane_tables`` returns None for non-RCM orderings). D > 1
    levels window too (round 5), under either exchange mode (per-offset
    rings or batched all_to_all): each shard's owned columns are a
    contiguous RCM band and its halo columns live at the extended tail,
    carried by the tables' tail pack — the conv still runs its halo
    exchange first, then the windowed gather over the extended array. The
    rotation-invariant first conv keeps the flat gather (its zero-padding
    contract is carried by ``validF``, wired only for the default conv), so
    level 0 is skipped for that variant.

    At D > 1 the per-shard tables are built with a SHARED static geometry
    (window/bwd_window maxed across shards) and stacked [D, ...]; if any
    shard lacks locality the level falls back to flat for all."""
    from facet_graph_convolution_tpu.graph.convert import windowed_lane_tables

    if min_nodes is None:
        min_nodes = WINDOWED_MIN_NODES
    if block is None:
        block = WINDOWED_BLOCK
    out = []
    for i, lvl in enumerate(part.levels):
        if (
            lvl.block < min_nodes
            or (i == 0 and variant == FacetConvVariant.ROTATION_INVARIANT)
        ):
            out.append(None)
            continue
        key = (i, block)
        if key not in part._window_cache:
            part._window_cache[key] = _build_shard_windows(lvl, block)
        out.append(part._window_cache[key])
    return out


def _build_shard_windows(lvl: LevelPartition, block: int,
                         force_window=None, force_bwd=None):
    """Windowed tables for every shard of one level under ONE static
    geometry (the scan body is compiled once and runs on all shards), or
    None when any shard lacks the banded structure. Returns a
    WindowedLaneTables whose array pack is stacked [D, ...].
    ``force_window``/``force_bwd`` pin a LARGER static geometry
    (multi-mesh compile reuse — see :func:`unify_level_windows`)."""
    from facet_graph_convolution_tpu.graph.convert import (
        WindowedLaneTables,
        windowed_lane_tables,
    )

    d = lvl.local_adj.shape[0]
    ext = lvl.lane_adj_t.shape[2]

    def build(s, window=force_window, bwd_window=force_bwd):
        return windowed_lane_tables(
            lvl.local_adj[s], num_sources=ext, block=block,
            window=window, bwd_window=bwd_window,
            tables=(lvl.lane_adj[s], lvl.lane_adj_t[s]),
        )
    if d == 1:
        return build(0)
    per = [build(s) for s in range(d)]
    if any(wt is None for wt in per):
        return None
    wmax = max(wt.window for wt in per)
    bmax = max(wt.bwd_window for wt in per)
    per = [wt if (wt.window == wmax and wt.bwd_window == bmax)
           else build(s, window=wmax, bwd_window=bmax)
           for s, wt in enumerate(per)]
    ref = per[0]
    stacked = [np.stack([wt.arrays[j] for wt in per])
               for j in range(len(ref.arrays))]
    names = ("out_starts", "win_starts", "relT", "validF",
             "bwd_starts", "relS", "validS", "not_tail", "tailT",
             "tailS", "tailV")
    kw = dict(zip(names, stacked))
    return WindowedLaneTables(
        block=ref.block, window=wmax, bwd_window=bmax,
        num_sources=ref.num_sources, num_out=ref.num_out, **kw,
    )


def unify_level_windows(
    parts: Sequence[GraphPartition],
    variant: FacetConvVariant = FacetConvVariant.DEFAULT,
    min_nodes: Optional[int] = None,
    block: Optional[int] = None,
):
    """Make several same-geometry partitions share IDENTICAL windowed-gather
    static geometry (window / bwd_window = max across meshes; a level that
    windows in one mesh but not another is disabled for all), so one compiled
    sharded step serves every mesh. Results land in each partition's window
    cache, where :func:`build_level_windows` (and hence
    ``make_sharded_train_step``) picks them up."""
    if block is None:
        block = WINDOWED_BLOCK
    per_part = [
        build_level_windows(p, min_nodes=min_nodes, block=block, variant=variant)
        for p in parts
    ]
    for i in range(len(parts[0].levels)):
        wts = [pp[i] for pp in per_part]
        if any(wt is None for wt in wts):
            for p in parts:
                p._window_cache[(i, block)] = None
            continue
        wmax = max(wt.window for wt in wts)
        bmax = max(wt.bwd_window for wt in wts)
        for p, wt in zip(parts, wts):
            if wt.window != wmax or wt.bwd_window != bmax:
                p._window_cache[(i, block)] = _build_shard_windows(
                    p.levels[i], block,
                    force_window=wmax, force_bwd=bmax,
                )


# ---------------------------------------------------------------------------
# Device-side sharded ops (called inside shard_map; x blocks are [n, C])
# ---------------------------------------------------------------------------

def _halo_extend(x, send_idx, recv_mask, offsets, axis,
                 cross_send=None, cross_mask=None):
    """Gather and exchange halo rows: returns [n + num_off·H (+ D·Hx), C]
    extended features. Padding/inactive slots carry zeros so downstream
    zero-row gather semantics hold.

    Intra-host traffic rides one ``ppermute`` per ring offset (ICI on a
    process-contiguous mesh); when ``cross_send`` is given, all cross-host
    rows batch into ONE ``all_to_all`` — a single DCN transfer per layer."""
    num_off, halo = send_idx.shape
    parts = [x]
    for j, d in enumerate(offsets):
        rows = jnp.take(x, send_idx[j], axis=0)          # [H, C]
        size = jax.lax.axis_size(axis)
        # receiver s gets data from source s + d ⇒ permutation (src → src − d)
        perm = [(src, (src - d) % size) for src in range(size)]
        received = jax.lax.ppermute(rows, axis, perm)
        received = received * recv_mask[j][:, None]
        parts.append(received)
    if cross_send is not None:
        d_sz, hx = cross_send.shape                      # [D, Hx] per shard
        rows = jnp.take(x, cross_send.reshape(-1), axis=0)
        rows = rows.reshape(d_sz, hx, x.shape[-1])       # block t → shard t
        received = jax.lax.all_to_all(
            rows, axis, split_axis=0, concat_axis=0, tiled=True
        )                                                # block o ← shard o
        received = received * cross_mask[..., None]
        parts.append(received.reshape(d_sz * hx, x.shape[-1]))
    return jnp.concatenate(parts, axis=0)


def _sharded_conv(params, x, ops, offsets, axis,
                  variant=FacetConvVariant.DEFAULT):
    """Facet conv on one shard: halo-extend then aggregate-transform.

    Matches :func:`facet_graph_convolution_tpu.ops.conv.facet_conv` on the
    full graph. ``adj`` is the deduped neighbours-only K-list with ``mult``
    slot multiplicities and the self slot split out (``self_mult``), so
    degrees — mult sums — equal the raw non-zero counts and the bias mask is
    globally exact. ``adj_t`` (over the halo-extended index space) makes the
    gather backward scatter-free; the halo rows' cotangents ride the
    reversed ppermute automatically.
    """
    from facet_graph_convolution_tpu.ops.gather import gather_neighbors

    adj, adj_t, send_idx, recv_mask, mult, self_mult = ops[:6]
    cross_send, cross_mask = ops[6:] if len(ops) > 6 else (None, None)
    u, c = params["u"], params["c"]
    in_ch = x.shape[-1]

    if variant == FacetConvVariant.ROTATION_INVARIANT:
        return _sharded_conv_rotinv(params, x, ops, offsets, axis)

    if variant == FacetConvVariant.DEFAULT:
        proj = params["v"]
    else:
        # u·(x_i − x_j) = u·x_i + (−u)·x_j — same identity as the
        # single-chip fused path (ops/conv._facet_conv_fused)
        proj = -u

    # ONE fused halo exchange + gather of [x | v·x]: the assignment
    # projection commutes with both the exchange and the gather, so the
    # per-conv [n,K,C]×[M,C] neighbour einsum collapses into M extra gathered
    # lanes (gather cost is row-overhead bound, width-insensitive); the self
    # slot is the local row, prepended without a gather
    cat = jnp.concatenate([x, x @ proj.T], axis=-1)      # [n, C+M]
    cat_ext = _halo_extend(cat, send_idx, recv_mask, offsets, axis,
                           cross_send, cross_mask)
    cat_nbr = gather_neighbors(cat_ext, adj, adj_t)      # [n, K', C+M]
    cat_nbr = jnp.concatenate([cat[:, None, :], cat_nbr], axis=1)
    mult_all = jnp.concatenate([self_mult[:, None], mult], axis=1)
    x_nbr = cat_nbr[..., :in_ch]
    vx_nbr = cat_nbr[..., in_ch:]

    ux = x @ u.T
    logits = ux[:, None, :] + vx_nbr + c
    q = jax.nn.softmax(logits, axis=-1) * mult_all[:, :, None]

    deg = jnp.sum(mult_all, axis=-1)
    inv_deg = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1), 0.0)
    z = jnp.einsum("nkm,nkc->nmc", q, x_nbr) * inv_deg[:, None, None]
    y = jnp.einsum("nmc,moc->no", z, params["w"],
                   preferred_element_type=jnp.float32)
    return jnp.where((deg > 0)[:, None], y + params["b"], y)


def _sharded_conv_rotinv(params, x, ops, offsets, axis):
    """Rotation-invariant sharded conv (first conv only — reference
    model.py:858). The assignment needs gathered + rotated neighbour
    features: exchange the RAW features, gather, rotate with the OWNED
    rows' per-node rotations; the self slot is analytic (rotated
    self-normal = +z, relative position 0) so the self-split partition
    needs no extra slot (ops/conv._rotation_invariant_feats)."""
    from facet_graph_convolution_tpu.ops.conv import _rotation_invariant_feats
    from facet_graph_convolution_tpu.ops.gather import gather_neighbors

    adj, adj_t, send_idx, recv_mask, mult, self_mult = ops[:6]
    cross_send, cross_mask = ops[6:] if len(ops) > 6 else (None, None)
    u, c, w, b = params["u"], params["c"], params["w"], params["b"]

    x_ext = _halo_extend(x, send_idx, recv_mask, offsets, axis,
                         cross_send, cross_mask)
    x_nbr = gather_neighbors(x_ext, adj, adj_t)          # [n, K', C]
    feats = _rotation_invariant_feats(x, x_nbr, self_slot=True)
    logits = jnp.einsum("nkc,mc->nkm", feats, u) + c
    q = jax.nn.softmax(logits, axis=-1)

    x_all = jnp.concatenate([x[:, None, :], x_nbr], axis=1)
    mult_all = jnp.concatenate([self_mult[:, None], mult], axis=1)
    q = q * mult_all[:, :, None]
    deg = jnp.sum(mult_all, axis=-1)
    inv_deg = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1), 0.0)
    z = jnp.einsum("nkm,nkc->nmc", q, x_all) * inv_deg[:, None, None]
    y = jnp.einsum("nmc,moc->no", z, w, preferred_element_type=jnp.float32)
    return jnp.where((deg > 0)[:, None], y + b, y)


def _halo_extend_nminor(x_t, send_idx, recv_mask, offsets, axis,
                        cross_send=None, cross_mask=None):
    """Node-minor halo exchange: ``x_t`` [C, n] → [C, n + num_off·H (+ D·Hx)].

    Same semantics as :func:`_halo_extend` with the node axis minormost —
    the exchanged blocks are [C, H] lane slices, so the ppermute payload is
    identical and no layout change is needed around the collective."""
    num_off, halo = send_idx.shape
    parts = [x_t]
    for j, d in enumerate(offsets):
        cols = jnp.take(x_t, send_idx[j], axis=1)        # [C, H]
        size = jax.lax.axis_size(axis)
        perm = [(src, (src - d) % size) for src in range(size)]
        received = jax.lax.ppermute(cols, axis, perm)
        received = received * recv_mask[j][None, :]
        parts.append(received)
    if cross_send is not None:
        d_sz, hx = cross_send.shape
        cols = jnp.take(x_t, cross_send.reshape(-1), axis=1)
        cols = cols.reshape(x_t.shape[0], d_sz, hx)      # block t → shard t
        received = jax.lax.all_to_all(
            cols, axis, split_axis=1, concat_axis=1, tiled=True
        )                                                # block o ← shard o
        received = received * cross_mask[None, :, :]
        parts.append(received.reshape(x_t.shape[0], d_sz * hx))
    return jnp.concatenate(parts, axis=1)


def _sharded_conv_nminor(params, x_t, ops, offsets, axis,
                         variant=FacetConvVariant.DEFAULT, compute_dtype=None,
                         win=None):
    """Node-minor sharded facet conv: ``x_t`` [C, n] → [out, n].

    The sharded counterpart of
    :func:`facet_graph_convolution_tpu.ops.conv.facet_conv_nminor` — same
    math as :func:`_sharded_conv` with activations kept [C, n] so XLA's VPU
    reduce fusions run without per-intermediate layout copies (measured
    ~7 ms/step on the single-chip path, BASELINE.md); row-major is confined
    to the gather boundary. ``mult_rows`` [K+1, n] is the fused
    multiplicity × 1/degree table (slot 0 = self, 0 on padding).

    The gather runs along the LANE (node) axis over the halo-extended
    node-minor array (``adj`` = transposed [K', n] K-list, ``adj_t`` = lane
    slot map over the extended space — LevelPartition.lane_adj[_t]): no
    layout change anywhere between the collective and the aggregation, the
    same formulation as the single-chip lane fast path (BASELINE.md
    45.1M → 50.2M edges/s).

    ``win`` (static geometry from WindowedLaneTables, wired per level by
    :func:`build_level_windows`) switches the gather to the windowed form:
    the tail of ``ops`` carries the windowed table pack (7 arrays, or 11
    with the D>1 halo-tail pack, preceded by the cross a2a tables when the
    level exchanges cross-host style). At D == 1 the level is purely local;
    at D > 1 the conv halo-extends FIRST and the windowed gather reads the
    extended array (owned band via slabs, halo columns via the tail pack)."""
    from facet_graph_convolution_tpu.ops.gather import (
        gather_neighbors_lane,
        make_windowed_lane_gather,
    )

    adj, adj_t, send_idx, recv_mask, mult_rows = ops[:5]
    if win is not None:
        # window pack size is static from the geometry; cross (a2a) tables,
        # when the level has them, sit at ops[5:7] before the pack
        n_wt = 11 if int(win[3]) > int(win[4]) else 7
        if len(ops) == 5 + 2 + n_wt:
            cross_send, cross_mask = ops[5], ops[6]
        else:
            assert len(ops) == 5 + n_wt, (len(ops), n_wt)
            cross_send, cross_mask = None, None
        wt_ops = ops[len(ops) - n_wt:]
    else:
        cross_send, cross_mask = ops[5:] if len(ops) > 5 else (None, None)
    u, c, w, b = params["u"], params["c"], params["w"], params["b"]
    dtype = compute_dtype or x_t.dtype
    in_ch, n = x_t.shape
    m, out_ch, _ = w.shape

    if variant == FacetConvVariant.ROTATION_INVARIANT:
        # the rotinv assignment keeps the flat gather (zero-padding via
        # validF) — a windowed ops pack carries only 1x1x1 dummy flat tables,
        # so routing rotinv through it would silently gather garbage
        if win is not None:
            raise NotImplementedError(
                "windowed lane gather does not support the rotation-invariant "
                "conv (build_level_windows skips level 0 for that variant; a "
                "windowed ops pack carries dummy flat tables)"
            )
        return _sharded_conv_nminor_rotinv(params, x_t, ops, offsets,
                                           axis, compute_dtype=compute_dtype)

    if variant == FacetConvVariant.DEFAULT:
        proj = params["v"]
    else:
        proj = -u

    vx_t = proj @ x_t                                    # [M, n]
    ux_t = u @ x_t                                       # [M, n]
    cat_t = jnp.concatenate([x_t, vx_t], axis=0).astype(dtype)   # [C+M, n]
    if win is not None:
        # D > 1 windowed levels halo-extend FIRST; the windowed tables' tail
        # pack gathers the halo columns from the extended tail (round 5)
        if int(win[3]) > int(win[4]):
            cat_t = _halo_extend_nminor(cat_t, send_idx, recv_mask, offsets,
                                        axis, cross_send, cross_mask)
    if win is not None and _WINDOWED_FUSED:
        # fused HBM-scale conv (BASELINE.md round 4): the whole epilogue —
        # gather, softmax assignment, multiplicity weighting, aggregation,
        # MXU transform — runs inside the per-slab scan, so neither the
        # [C+M, K', n] neighbour tensor nor q nor z ever round-trips HBM
        # (the unfused dataflow was measured at HBM speed-of-light)
        from facet_graph_convolution_tpu.ops.windowed_conv import (
            make_windowed_fused_conv,
        )

        wf = jnp.transpose(w, (1, 0, 2)).reshape(out_ch, m * in_ch)
        y_t = make_windowed_fused_conv(win)(
            cat_t, ux_t, wf, c, mult_rows, *wt_ops).astype(jnp.float32)
        gate = (jnp.sum(mult_rows, axis=0) > 0).astype(y_t.dtype)
        return y_t + b[:, None] * gate[None, :]
    if win is not None:
        # unfused windowed gather (BASELINE.md round 3; kept for A/B and as
        # the rotinv-adjacent fallback): at D == 1 the extended array IS
        # cat_t; clamped contract — padding slots gather finite in-window
        # garbage, provably zeroed by the mult_rows multiply on q below
        nbr_g = make_windowed_lane_gather(win)(cat_t, *wt_ops)
        cat_t = cat_t[:, : mult_rows.shape[1]]           # drop halo tail
    else:
        cat_ext_t = _halo_extend_nminor(cat_t, send_idx, recv_mask, offsets,
                                        axis, cross_send, cross_mask)
        # clamped: padding slots gather finite garbage, provably zeroed by
        # the mult_rows multiply on q below — saves the zero-column pad
        nbr_g = gather_neighbors_lane(cat_ext_t, adj, adj_t, clamped=True)
    # self slot: the local column, prepended without a gather
    nbr_t = jnp.concatenate([cat_t[:, None, :], nbr_g], axis=1)
    x_nbr_t = nbr_t[:in_ch]
    vx_nbr_t = nbr_t[in_ch:]

    logits_t = ux_t[:, None, :].astype(dtype) + vx_nbr_t + c[:, None, None].astype(dtype)
    q_t = jax.nn.softmax(logits_t.astype(jnp.float32), axis=0)   # over M
    q_t = (q_t * mult_rows[None, :, :]).astype(dtype)

    z_t = _aggregate_nminor(q_t, x_nbr_t)
    z_t = z_t.reshape(m * in_ch, n).astype(dtype)
    wf = jnp.transpose(w, (1, 0, 2)).reshape(out_ch, m * in_ch)
    y_t = jnp.einsum("oz,zn->on", wf.astype(dtype), z_t,
                     preferred_element_type=jnp.float32).astype(jnp.float32)
    gate = (jnp.sum(mult_rows, axis=0) > 0).astype(y_t.dtype)
    return y_t + b[:, None] * gate[None, :]


def _sharded_conv_nminor_rotinv(params, x_t, ops, offsets, axis,
                                compute_dtype=None):
    """Node-minor sharded rotation-invariant conv (first conv only): halo
    exchange + gather stay node-minor; only the small (C ≤ 6) rotation math
    runs row-major (see ops/conv._facet_conv_nminor_rotinv)."""
    from facet_graph_convolution_tpu.ops.conv import _rotation_invariant_feats
    from facet_graph_convolution_tpu.ops.gather import gather_neighbors_lane

    adj, adj_t, send_idx, recv_mask, mult_rows = ops[:5]
    cross_send, cross_mask = ops[5:] if len(ops) > 5 else (None, None)
    u, c, w, b = params["u"], params["c"], params["w"], params["b"]
    dtype = compute_dtype or x_t.dtype
    in_ch, n = x_t.shape
    m, out_ch, _ = w.shape

    x_ext_t = _halo_extend_nminor(x_t, send_idx, recv_mask, offsets, axis,
                                  cross_send, cross_mask)
    x_nbr_g = gather_neighbors_lane(x_ext_t, adj, adj_t)  # [C, K', n]
    x_nbr = jnp.transpose(x_nbr_g, (2, 1, 0))             # [n, K', C] (small C)
    x_row = x_t.T
    feats = _rotation_invariant_feats(x_row, x_nbr, self_slot=True)
    logits = jnp.einsum("nkc,mc->nkm", feats, u) + c      # [n, K'+1, M]
    q = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    q_t = jnp.transpose(q, (2, 1, 0))                     # [M, K'+1, n]
    q_t = (q_t * mult_rows[None, :, :]).astype(dtype)

    nbr_t = jnp.concatenate(
        [x_t[:, None, :], jnp.transpose(x_nbr, (2, 1, 0))], axis=1
    )                                                     # [C, K'+1, n]
    z_t = _aggregate_nminor(q_t, nbr_t.astype(dtype))
    z_t = z_t.reshape(m * in_ch, n).astype(dtype)
    wf = jnp.transpose(w, (1, 0, 2)).reshape(out_ch, m * in_ch)
    y_t = jnp.einsum("oz,zn->on", wf.astype(dtype), z_t,
                     preferred_element_type=jnp.float32).astype(jnp.float32)
    gate = (jnp.sum(mult_rows, axis=0) > 0).astype(y_t.dtype)
    return y_t + b[:, None] * gate[None, :]


def sharded_unet_forward_local_nminor(
    params, x, level_operands, offsets_per_level, axis,
    coarsening_steps=2, alpha=0.1, multi_scale=False, compute_dtype=None,
    variant=FacetConvVariant.DEFAULT, remat=False, wins=None,
):
    """Node-minor U-Net forward on one shard (inside shard_map): mirrors
    ``unet_apply_nminor`` with halo-extended convs and shard-local node-minor
    tree pool/unpool. ``x`` [n, C] in, outputs [n, out] — the [C, n]
    orientation is internal, transposed only at the public boundary.

    ``remat=True`` checkpoints every conv (and the wide fc head): the
    backward recomputes each conv's halo exchange + gather + softmax instead
    of saving the [C+M, K, n] neighbour tensors and the [1024, n] fc
    activations — the memory regime that fits multi-million-node shards
    (per-conv residuals alone exceed HBM at ~1.6M nodes on one chip).

    FUSED-windowed convs are never checkpointed even under ``remat=True``:
    the fused slab conv's custom VJP already saves only its [C+M, n] inputs
    (the same residual footprint checkpoint would keep) and recomputes each
    slab inside its own backward scan, so wrapping it in ``jax.checkpoint``
    buys no memory. Measured near-neutral on the 1.27M-node torus (round 5:
    1.618 → 1.582 s busy, −2.2% — XLA had already dead-code-eliminated the
    redundant recompute because the custom VJP's residuals are the inputs);
    kept because it removes the pointless wrapper and its barrier
    interactions (the remat+custom-VJP miscompile class, BASELINE.md
    round 4)."""
    from facet_graph_convolution_tpu.ops.conv import per_conv_variants

    ops0, ops1, ops2 = level_operands
    o0, o1, o2 = offsets_per_level
    w0, w1, w2 = wins if wins is not None else (None, None, None)
    v_first, v_rest = per_conv_variants(variant)
    ckpt = jax.checkpoint if remat else (lambda f: f)

    def conv(p, h_t, ops, offs, var=v_rest, win=None):
        def apply(p, h_t):
            return _sharded_conv_nminor(p, h_t, ops, offs, axis, variant=var,
                                        compute_dtype=compute_dtype, win=win)

        if win is not None and _WINDOWED_FUSED:
            return apply(p, h_t)
        return ckpt(apply)(p, h_t)

    def lin(name, h_t):
        p = params[name]
        return p["w"].T @ h_t + p["b"][:, None]

    x_t = x.T                                            # [C, n]
    h1 = lrelu(conv(params["conv1"], x_t, ops0, o0, var=v_first, win=w0), alpha)
    p1 = tree_pool_nminor(h1, steps=coarsening_steps, mode="max")
    h2 = lrelu(conv(params["conv2"], p1, ops1, o1, win=w1), alpha)
    p2 = tree_pool_nminor(h2, steps=coarsening_steps, mode="max")
    h3 = lrelu(conv(params["conv3"], p2, ops2, o2, win=w2), alpha)
    d3 = lrelu(conv(params["dconv3"], h3, ops2, o2, win=w2), alpha)

    y_coarse = None
    if multi_scale:
        hc = lrelu(lin("fc_coarse", d3), alpha)
        y_coarse = lin("out2", hc).T

    u2 = tree_unpool_nminor(d3, steps=coarsening_steps)
    u2 = conv(params["upconv2"], u2, ops1, o1, win=w1)
    d2 = lrelu(
        conv(params["dconv2"], jnp.concatenate([u2, h2], axis=0), ops1, o1,
             win=w1),
        alpha,
    )
    y_mid = None
    if multi_scale:
        hm = lrelu(lin("fc_mid", d2), alpha)
        y_mid = lin("out1", hm).T

    u1 = tree_unpool_nminor(d2, steps=coarsening_steps)
    u1 = conv(params["upconv1"], u1, ops0, o0, win=w0)
    d1 = lrelu(
        conv(params["dconv1"], jnp.concatenate([u1, h1], axis=0), ops0, o0,
             win=w0),
        alpha,
    )

    def head(fc1, out0, d1):
        h = lrelu(fc1["w"].T @ d1 + fc1["b"][:, None], alpha)
        return (out0["w"].T @ h + out0["b"][:, None]).T

    y_fine = ckpt(head)(params["fc1"], params["out0"], d1)
    if multi_scale:
        return y_fine, y_mid, y_coarse
    return y_fine


def _sharded_normalize_tensor(x, axis, epsilon=1e-5):
    """normalize_tensor (utils.py:1700-1715) with the global mean-|x|
    prescale computed across shards."""
    total = jax.lax.psum(jnp.sum(jnp.abs(x)), axis)
    count = jax.lax.psum(jnp.asarray(x.size, jnp.float32), axis)
    mean_val = total / count
    x = x / (mean_val + epsilon)
    norm = jnp.sqrt(epsilon + jnp.sum(jnp.square(x), axis=-1))
    inv = jnp.where(norm > epsilon, 1.0 / (norm + epsilon), 0.0)
    return x * inv[..., None]


def _sharded_face_normals_loss(pred, gt, sample_mask, axis):
    """faceNormalsLoss (train.py:1272-1294) over shards: psum numerator and
    real-node count. ``sample_mask`` [n] selects loss faces (the sampled-4000
    discipline) — pass ones to use every face."""
    from facet_graph_convolution_tpu.models.losses import _CLOSE_TO_ONE
    import math

    dp = jnp.sum(pred * gt, axis=-1)
    ang = jnp.arccos(jnp.clip(dp, -_CLOSE_TO_ONE, _CLOSE_TO_ONE)) * (180.0 / math.pi)
    fake = _fake_node_mask(gt)
    real = jnp.where(fake, 0.0, 1.0) * sample_mask
    num = jax.lax.psum(jnp.sum(ang * real), axis)
    den = jax.lax.psum(jnp.sum(real), axis)
    return num / den


def sharded_unet_forward_local(
    params, x, level_operands, offsets_per_level, axis,
    coarsening_steps=2, alpha=0.1, multi_scale=False,
    variant=FacetConvVariant.DEFAULT,
):
    """U-Net forward on one shard (runs inside shard_map). Mirrors
    ``unet_apply`` layer-for-layer with halo-extended convs and local tree
    pool/unpool (partition alignment keeps sibling groups shard-local)."""
    from facet_graph_convolution_tpu.ops.conv import per_conv_variants

    ops0, ops1, ops2 = level_operands
    o0, o1, o2 = offsets_per_level
    v_first, v_rest = per_conv_variants(variant)

    def conv(p, h, ops, offs, var=v_rest):
        return _sharded_conv(p, h, ops, offs, axis, variant=var)

    h1 = lrelu(conv(params["conv1"], x, ops0, o0, var=v_first), alpha)
    p1 = tree_pool(h1, steps=coarsening_steps, mode="max")
    h2 = lrelu(conv(params["conv2"], p1, ops1, o1), alpha)
    p2 = tree_pool(h2, steps=coarsening_steps, mode="max")
    h3 = lrelu(conv(params["conv3"], p2, ops2, o2), alpha)
    d3 = lrelu(conv(params["dconv3"], h3, ops2, o2), alpha)

    y_coarse = None
    if multi_scale:
        hc = lrelu(d3 @ params["fc_coarse"]["w"] + params["fc_coarse"]["b"], alpha)
        y_coarse = hc @ params["out2"]["w"] + params["out2"]["b"]

    u2 = tree_unpool(d3, steps=coarsening_steps)
    u2 = conv(params["upconv2"], u2, ops1, o1)
    d2 = lrelu(
        conv(params["dconv2"], jnp.concatenate([u2, h2], axis=-1), ops1, o1),
        alpha,
    )
    y_mid = None
    if multi_scale:
        hm = lrelu(d2 @ params["fc_mid"]["w"] + params["fc_mid"]["b"], alpha)
        y_mid = hm @ params["out1"]["w"] + params["out1"]["b"]

    u1 = tree_unpool(d2, steps=coarsening_steps)
    u1 = conv(params["upconv1"], u1, ops0, o0)
    d1 = lrelu(
        conv(params["dconv1"], jnp.concatenate([u1, h1], axis=-1), ops0, o0),
        alpha,
    )
    h = lrelu(d1 @ params["fc1"]["w"] + params["fc1"]["b"], alpha)
    y_fine = h @ params["out0"]["w"] + params["out0"]["b"]
    if multi_scale:
        return y_fine, y_mid, y_coarse
    return y_fine


def sharded_unet_apply(
    params,
    x: jnp.ndarray,                  # [N, C] full graph (host order)
    part: GraphPartition,
    mesh: Mesh,
    axis: str = "graph",
    coarsening_steps: int = 2,
    normalize: bool = True,
    multi_scale: bool = False,
    layout: str = "nminor",
    compute_dtype=None,
    variant: FacetConvVariant = FacetConvVariant.DEFAULT,
):
    """Jittable full forward over the device mesh; returns [N, 3] assembled
    predictions identical (to float tolerance) to the single-device
    ``unet_apply`` + ``normalize_tensor`` (a 3-tuple of per-level outputs
    with ``multi_scale=True``).

    ``layout="nminor"`` (default, matching the single-chip fast path) keeps
    activations node-minor through the net; ``"rowmajor"`` keeps the [n, C]
    formulation (required for the rotation-invariant variant)."""
    nminor = layout == "nminor"
    if nminor:
        windows = build_level_windows(part, variant=variant)
        wins = tuple(wt.geometry if wt is not None else None for wt in windows)
        operands = partition_operands_nminor(part, windows)
    else:
        wins = (None,) * len(part.levels)
        operands = partition_operands(part)
    offsets = tuple(lvl.offsets for lvl in part.levels)
    if jax.process_count() > 1:
        # multi-host: every process holds the full host-side tables; build
        # global arrays carrying only the addressable shards
        from facet_graph_convolution_tpu.parallel.distributed import (
            distribute,
            replicate,
        )

        operands = jax.tree.map(
            lambda a: distribute(mesh, P(axis), np.asarray(a)), operands
        )
        x = distribute(mesh, P(axis), np.asarray(x))
        params = replicate(mesh, params)
    else:
        # single dispatch here, but callers may re-invoke: commit tables
        # under the expected sharding (see make_sharded_train_step)
        table_sharding = jax.sharding.NamedSharding(mesh, P(axis))
        operands = jax.tree.map(
            lambda a: jax.device_put(a, table_sharding), operands
        )

    in_specs = (
        P(),
        P(axis),
        jax.tree.map(lambda _: P(axis), operands),
    )
    out_specs = (P(axis), P(axis), P(axis)) if multi_scale else P(axis)

    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    def run(params, x_block, level_ops):
        level_ops = jax.tree.map(lambda arr: arr[0], level_ops)
        fwd = sharded_unet_forward_local_nminor if nminor else sharded_unet_forward_local
        kw = {"compute_dtype": compute_dtype, "wins": wins} if nminor else {}
        y = fwd(
            params, x_block, level_ops, offsets, axis,
            coarsening_steps=coarsening_steps, multi_scale=multi_scale,
            variant=variant, **kw,
        )
        if normalize:
            if multi_scale:
                y = tuple(_sharded_normalize_tensor(h, axis) for h in y)
            else:
                y = _sharded_normalize_tensor(y, axis)
        return y

    return run(params, x, operands)


def make_sharded_train_step(
    tx: optax.GradientTransformation,
    cfg: Config,
    part: GraphPartition,
    mesh: Mesh,
    axis: str = "graph",
    layout: str = "nminor",
    remat: bool = False,
):
    """Full training step over an edge-partitioned graph: each shard computes
    the loss on its owned nodes; gradients are psum-reduced by shard_map's
    partitioned autodiff. ``layout`` as in :func:`sharded_unet_apply`;
    ``cfg.model.compute_dtype`` selects bf16 mixed precision on the
    node-minor path (matching the single-chip trainer). ``remat`` (node-minor
    only) checkpoints each conv + the fc head — required when per-shard node
    counts reach the multi-hundred-k regime (see
    sharded_unet_forward_local_nminor)."""
    steps = cfg.model.coarsening_steps
    nminor = layout == "nminor"
    from facet_graph_convolution_tpu.training.trainer import _config_variant

    variant = _config_variant(cfg)
    if nminor:
        windows = build_level_windows(part, variant=variant)
        wins = tuple(wt.geometry if wt is not None else None for wt in windows)
        operands = partition_operands_nminor(part, windows)
    else:
        wins = (None,) * len(part.levels)
        operands = partition_operands(part)
    offsets = tuple(lvl.offsets for lvl in part.levels)
    if jax.process_count() > 1:
        from facet_graph_convolution_tpu.parallel.distributed import distribute

        operands = jax.tree.map(
            lambda a: distribute(mesh, P(axis), np.asarray(a)), operands
        )
    else:
        # commit the tables under the EXACT sharding the jitted step expects:
        # default-placed (unsharded) arrays are otherwise re-laid-out on
        # every dispatch, which on a tunnel-attached TPU is a host-mediated
        # copy — measured 6.6 s/step of pure overhead at 1.27M nodes
        table_sharding = jax.sharding.NamedSharding(mesh, P(axis))
        operands = jax.tree.map(
            lambda a: jax.device_put(a, table_sharding), operands
        )
    compute_dtype = (
        jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else None
    )

    in_specs = (
        P(),
        P(axis),
        P(axis),
        P(axis),
        P(),                                      # rotation matrix (replicated)
        jax.tree.map(lambda _: P(axis), operands),
    )

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=in_specs, out_specs=(P(), P()),
    )
    def loss_and_grads(params, x_block, gt_block, mask_block, rot, level_ops):
        from facet_graph_convolution_tpu.models.augment import (
            rotate_inputs,
            rotate_vec3,
        )

        level_ops = jax.tree.map(lambda arr: arr[0], level_ops)
        # rotation augmentation is row-wise, so applying it per shard block
        # matches the single-device trainer exactly (train.py:437-483)
        x_block = rotate_inputs(rot, x_block)
        gt_block = rotate_vec3(rot, gt_block)

        def loss_fn(params):
            if nminor:
                y = sharded_unet_forward_local_nminor(
                    params, x_block, level_ops, offsets, axis,
                    coarsening_steps=steps, compute_dtype=compute_dtype,
                    variant=variant, remat=remat, wins=wins,
                )
            else:
                y = sharded_unet_forward_local(
                    params, x_block, level_ops, offsets, axis,
                    coarsening_steps=steps, variant=variant,
                )
            y = _sharded_normalize_tensor(y, axis)
            return _sharded_face_normals_loss(y, gt_block, mask_block, axis)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # loss/grads are already globally reduced via the psums inside;
        # pmean the grads defensively to keep replicas in lockstep
        grads = jax.lax.pmean(grads, axis)
        return jax.lax.pmean(loss, axis), grads

    def _rot(key):
        from facet_graph_convolution_tpu.models.augment import random_rotation

        if key is None:
            return jnp.eye(3, dtype=jnp.float32)
        return random_rotation(key)

    # operands are passed as jit ARGUMENTS (multi-host jax.Arrays cannot be
    # closed over — they span non-addressable devices)
    @jax.jit
    def _step(state: TrainState, x, gt, sample_mask, key, ops):
        loss, grads = loss_and_grads(
            state.params, x, gt, sample_mask, _rot(key), ops
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    @jax.jit
    def _eval(params, x, gt, sample_mask, ops):
        loss, _ = loss_and_grads(
            params, x, gt, sample_mask, jnp.eye(3, dtype=jnp.float32), ops
        )
        return loss

    def step(state: TrainState, x, gt, sample_mask, key=None):
        return _step(state, x, gt, sample_mask, key, operands)

    step.eval = lambda params, x, gt, sample_mask: _eval(
        params, x, gt, sample_mask, operands
    )
    # callers that wrap the step in an OUTER jit (e.g. a lax.scan over
    # steps) must pass the tables as arguments of that outer jit — tracing
    # the `step` closure inside another jit would embed the concrete table
    # arrays as HLO constants (~400 chars/node of program text; a 1.6M-node
    # graph then exceeds compile-request limits)
    step.raw = _step
    step.operands = operands
    return step


def _prepare_sharded_mesh_arrays(cfg, patch, mesh, axis, target_nodes=None):
    """Pad + partition one whole-mesh patch for the mesh and stage its
    input/GT arrays (globally sharded in multi-process runs).
    ``target_nodes`` overrides the bucket (multi-mesh common bucket)."""
    from facet_graph_convolution_tpu.data.dataset import bucket_size, pad_patch_to

    n_dev = mesh.shape[axis]
    group = (2 ** cfg.model.coarsening_steps) ** (cfg.model.coarsening_levels - 1)
    tgt = bucket_size(patch.num_nodes, group * n_dev)
    if target_nodes is not None:
        tgt = max(tgt, target_nodes)
    padded = pad_patch_to(patch, tgt)
    dph = jax.local_device_count() if jax.process_count() > 1 else None
    part = build_partition(padded.adjs, n_dev, devices_per_host=dph)

    if jax.process_count() > 1:
        from facet_graph_convolution_tpu.parallel.distributed import distribute

        stage = lambda a: distribute(mesh, P(axis), np.asarray(a))
    else:
        # commit under the step's expected sharding once (see the same
        # device_put in make_sharded_train_step: unsharded args re-lay-out
        # per dispatch, host-mediated on tunnel-attached TPUs)
        row_sharding = jax.sharding.NamedSharding(mesh, P(axis))
        stage = lambda a: jax.device_put(jnp.asarray(a), row_sharding)
    return part, stage(padded.inputs), stage(padded.gt_normals), padded.num_nodes, stage


def train_normals_sharded(
    cfg: Config,
    patch,                              # FacetPatch covering the whole mesh
    mesh: Mesh,
    num_iterations: int,
    valid_patches: Optional[Sequence] = None,
    axis: str = "graph",
    loss_samples: Optional[int] = None,
    log_every: int = 50,
    seed: int = 0,
    checkpoint: bool = False,
):
    """Train on ONE large edge-partitioned mesh: the graph-parallel
    counterpart of the per-patch loop — every step is a full-graph forward
    over all shards with a fresh random loss-face sample (the analogue of the
    reference's 4000-face sampling, train.py:415,561).

    Full driver contract (matching the single-device ``train_normals``,
    training/trainer.py): in-graph rotation augmentation, Orbax
    checkpoint/resume, periodic validation sweep over ``valid_patches``
    (each partitioned over the same mesh), NaN abort, and the
    ``<network_path>/<net_name>.csv`` loss-history artifact. Works unchanged
    under multi-process execution (parallel/distributed): host RNG draws are
    seed-deterministic so every process stays in lockstep, and only process
    0 writes the CSV.
    """
    from facet_graph_convolution_tpu.training.checkpoint import CheckpointManager
    from facet_graph_convolution_tpu.training.trainer import create_train_state

    part, x, gt, n, stage = _prepare_sharded_mesh_arrays(cfg, patch, mesh, axis)

    key = jax.random.PRNGKey(seed)
    state, tx = create_train_state(key, cfg, num_steps=num_iterations)
    if jax.process_count() > 1:
        from facet_graph_convolution_tpu.parallel.distributed import replicate

        state = replicate(mesh, state)
    else:
        # commit under the step's replicated output sharding (see the
        # multi-mesh driver: avoids a first-step-only second compile)
        state = jax.device_put(state, jax.sharding.NamedSharding(mesh, P()))
    step = make_sharded_train_step(tx, cfg, part, mesh, axis=axis)

    ckpt = CheckpointManager(cfg.train.network_path, cfg.train.net_name) if checkpoint else None
    start_step = 0
    if ckpt is not None:
        state, start_step = ckpt.restore(state)
        if start_step:
            # restored arrays land on one device; re-replicate over the mesh
            from jax.sharding import NamedSharding

            state = jax.device_put(state, NamedSharding(mesh, P()))

    valid = []
    for vp in valid_patches or []:
        vpart, vx, vgt, vn, _ = _prepare_sharded_mesh_arrays(cfg, vp, mesh, axis)
        vstep = make_sharded_train_step(tx, cfg, vpart, mesh, axis=axis)
        valid.append((vstep.eval, vx, vgt, vn))

    samples = loss_samples or cfg.train.loss_samples
    augment = cfg.train.augment_rotations
    rng = np.random.default_rng(seed)
    losses = []
    loss_hist: List[Tuple[float, float]] = []
    last_valid = float("nan")
    aborted = False
    with mesh:
        for it in range(num_iterations):
            mask = np.zeros(n, np.float32)
            mask[rng.integers(0, n, size=samples)] = 1.0
            key, sub = jax.random.split(key)
            state, loss = step(state, x, gt, stage(mask),
                               sub if augment else None)
            losses.append(float(loss))
            if valid and it % cfg.train.valid_every == 0:
                vloss = 0.0
                for eval_fn, vx, vgt, vn in valid:
                    vmask = np.zeros(vn, np.float32)
                    vmask[rng.integers(0, vn, size=min(samples, vn))] = 1.0
                    vloss += float(eval_fn(state.params, vx, vgt, stage(vmask)))
                last_valid = vloss / len(valid)
            if it % log_every == 0:
                avg = float(np.mean(losses[-log_every:]))
                loss_hist.append((avg, last_valid))
                print(f"iter {it}: sharded loss {avg:.4f}"
                      + (f" valid {last_valid:.4f}" if valid else ""))
                if not np.isfinite(avg):
                    print("NaN training loss — aborting")
                    aborted = True
                    break
            if ckpt is not None and it > 0 and it % cfg.train.save_every == 0:
                if not np.isfinite(float(losses[-1])):
                    print("NaN training loss — aborting at checkpoint")
                    aborted = True
                    break
                ckpt.save(start_step + it, state)
    if ckpt is not None:
        if not aborted:
            # a NaN abort leaves ``state`` poisoned — never persist it as the
            # final checkpoint (same guard as training/trainer.py)
            ckpt.save(start_step + num_iterations, state)
        ckpt.close()
    if jax.process_index() == 0 and loss_hist:
        os.makedirs(cfg.train.network_path, exist_ok=True)
        csv_path = os.path.join(cfg.train.network_path, cfg.train.net_name + ".csv")
        with open(csv_path, "ab") as fh:
            np.savetxt(fh, np.asarray(loss_hist, dtype=np.float64), delimiter=",")
    return state, np.asarray(losses)


def prepare_sharded_mesh_bank(cfg, patches, mesh, axis: str = "graph"):
    """Partition SEVERAL whole-mesh patches so one compiled sharded step
    serves them all: pad every mesh to the common node bucket, partition with
    the merged (offset-union / max-width) :class:`LevelGeometry`, and unify
    the windowed-gather static geometry.

    Returns ``(parts, xs, gts, num_nodes, stage)``. Meshes whose first-pass
    geometry already equals the merged geometry skip the second partition
    pass (identical-topology meshes — e.g. the same CAD model at several
    noise levels — unify for free)."""
    from facet_graph_convolution_tpu.data.dataset import bucket_size, pad_patch_to
    from facet_graph_convolution_tpu.training.trainer import _config_variant

    n_dev = mesh.shape[axis]
    group = (2 ** cfg.model.coarsening_steps) ** (cfg.model.coarsening_levels - 1)
    target = max(bucket_size(p.num_nodes, group * n_dev) for p in patches)
    padded = [pad_patch_to(p, target) for p in patches]
    dph = jax.local_device_count() if jax.process_count() > 1 else None

    # pass 1: per-mesh partitions (auto exchange); unify the per-level
    # exchange mode first — a level that batches cross-host/a2a tables in ANY
    # mesh must do so in all (merge_geometry requires matching modes)
    parts = [build_partition(pp.adjs, n_dev, devices_per_host=dph)
             for pp in padded]
    nlev = len(parts[0].levels)
    for i in range(nlev):
        if any(pt.levels[i].cross_send is not None for pt in parts):
            for m, pt in enumerate(parts):
                if pt.levels[i].cross_send is None:
                    pt.levels[i] = _partition_level(
                        np.asarray(padded[m].adjs[i]), n_dev, dph or 1
                    )

    geoms = [level_geometry(lvl) for lvl in parts[0].levels]
    for pt in parts[1:]:
        geoms = [merge_geometry(g, level_geometry(lvl))
                 for g, lvl in zip(geoms, pt.levels)]

    # pass 2: rebuild only the meshes whose shapes diverge from the merge
    for m, pt in enumerate(parts):
        if any(level_geometry(lvl) != g for lvl, g in zip(pt.levels, geoms)):
            parts[m] = build_partition(
                padded[m].adjs, n_dev, devices_per_host=dph, geometry=geoms
            )
    unify_level_windows(parts, variant=_config_variant(cfg))

    if jax.process_count() > 1:
        from facet_graph_convolution_tpu.parallel.distributed import distribute

        stage = lambda a: distribute(mesh, P(axis), np.asarray(a))
    else:
        row_sharding = jax.sharding.NamedSharding(mesh, P(axis))
        stage = lambda a: jax.device_put(jnp.asarray(a), row_sharding)
    xs = [stage(pp.inputs) for pp in padded]
    gts = [stage(pp.gt_normals) for pp in padded]
    return parts, xs, gts, target, stage


def train_normals_sharded_multi(
    cfg: Config,
    patches: Sequence,
    mesh: Mesh,
    num_iterations: int,
    axis: str = "graph",
    loss_samples: Optional[int] = None,
    log_every: int = 50,
    seed: int = 0,
    checkpoint: bool = False,
    remat: bool = False,
):
    """Dataset-scale sharded training: cycle SEVERAL large edge-partitioned
    meshes in one driver call with one compiled step (the single-mesh
    :func:`train_normals_sharded` is locked to one partition). The reference
    cycles training patches the same way (random patch per iteration,
    train.py:558); here each "patch" is a whole edge-partitioned mesh.

    Compile reuse: all meshes are padded to a common bucket and partitioned
    with merged :class:`LevelGeometry` (``prepare_sharded_mesh_bank``), so the
    per-mesh table pytrees are shape-identical and ``step.raw`` — which takes
    the tables as jit ARGUMENTS — hits one compiled executable for every mesh
    (asserted loudly below; a silent shape divergence would recompile per
    mesh, minutes at the million-node scale)."""
    from facet_graph_convolution_tpu.training.checkpoint import CheckpointManager
    from facet_graph_convolution_tpu.training.trainer import (
        _config_variant,
        create_train_state,
    )

    parts, xs, gts, n, stage = prepare_sharded_mesh_bank(cfg, patches, mesh, axis)
    variant = _config_variant(cfg)

    key = jax.random.PRNGKey(seed)
    state, tx = create_train_state(key, cfg, num_steps=num_iterations)
    if jax.process_count() > 1:
        from facet_graph_convolution_tpu.parallel.distributed import replicate

        state = replicate(mesh, state)
    else:
        # commit under the step's replicated output sharding NOW: an
        # uncommitted fresh state otherwise compiles a second, first-step-only
        # executable (minutes of wasted compile at the million-node scale)
        state = jax.device_put(state, jax.sharding.NamedSharding(mesh, P()))
    step = make_sharded_train_step(tx, cfg, parts[0], mesh, axis=axis, remat=remat)

    ops_list = [step.operands]
    if jax.process_count() > 1:
        from facet_graph_convolution_tpu.parallel.distributed import distribute

        stage_tables = lambda a: distribute(mesh, P(axis), np.asarray(a))
    else:
        table_sharding = jax.sharding.NamedSharding(mesh, P(axis))
        stage_tables = lambda a: jax.device_put(a, table_sharding)
    for pt in parts[1:]:
        windows = build_level_windows(pt, variant=variant)   # unified, cached
        ops = partition_operands_nminor(pt, windows)
        ops_list.append(jax.tree.map(stage_tables, ops))
    ref_struct = jax.tree.structure(ops_list[0])
    ref_shapes = [(a.shape, a.dtype) for a in jax.tree.leaves(ops_list[0])]
    for m, ops in enumerate(ops_list[1:], 1):
        assert jax.tree.structure(ops) == ref_struct, f"mesh {m}: tree structure diverges"
        got = [(a.shape, a.dtype) for a in jax.tree.leaves(ops)]
        assert got == ref_shapes, (
            f"mesh {m}: operand shapes diverge from mesh 0 — the step would "
            f"recompile per mesh"
        )

    ckpt = CheckpointManager(cfg.train.network_path, cfg.train.net_name) if checkpoint else None
    start_step = 0
    if ckpt is not None:
        state, start_step = ckpt.restore(state)
        if start_step:
            state = jax.device_put(state, jax.sharding.NamedSharding(mesh, P()))

    samples = loss_samples or cfg.train.loss_samples
    augment = cfg.train.augment_rotations
    rng = np.random.default_rng(seed)
    losses: List[float] = []
    loss_hist: List[Tuple[float, float]] = []
    aborted = False
    with mesh:
        for it in range(num_iterations):
            m = int(rng.integers(len(ops_list)))
            mask = np.zeros(n, np.float32)
            mask[rng.integers(0, n, size=samples)] = 1.0
            key, sub = jax.random.split(key)
            state, loss = step.raw(state, xs[m], gts[m], stage(mask),
                                   sub if augment else None, ops_list[m])
            losses.append(float(loss))
            if it % log_every == 0:
                avg = float(np.mean(losses[-log_every:]))
                loss_hist.append((avg, float("nan")))
                print(f"iter {it}: sharded multi-mesh loss {avg:.4f} (mesh {m})")
                if not np.isfinite(avg):
                    print("NaN training loss — aborting")
                    aborted = True
                    break
            if ckpt is not None and it > 0 and it % cfg.train.save_every == 0:
                if not np.isfinite(float(losses[-1])):
                    print("NaN training loss — aborting at checkpoint")
                    aborted = True
                    break
                ckpt.save(start_step + it, state)
    if ckpt is not None:
        if not aborted:
            ckpt.save(start_step + num_iterations, state)
        ckpt.close()
    if jax.process_index() == 0 and loss_hist:
        os.makedirs(cfg.train.network_path, exist_ok=True)
        csv_path = os.path.join(cfg.train.network_path, cfg.train.net_name + ".csv")
        with open(csv_path, "ab") as fh:
            np.savetxt(fh, np.asarray(loss_hist, dtype=np.float64), delimiter=",")
    # expose the jit cache for compile-reuse checks (tests)
    train_normals_sharded_multi.last_cache_size = step.raw._cache_size()
    return state, np.asarray(losses)
