"""K-list ↔ sparse-COO adjacency conversion (vectorized).

Parity targets: ``listToSparse`` (utils.py:1718-1750), ``listToSparseWNormals``
(utils.py:1753-1796), ``sparseToList`` (utils.py:1799-1827), ``inv_perm``
(utils.py:1830-1835).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.sparse


def _klist_edges(adj: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Directed edges (row, col) from a one-indexed K-list, skipping slot 0
    (self) and stopping at the first 0 pad per row like the reference's
    ``break`` (utils.py:1770-1773). K-lists are filled contiguously so a pad
    mask is equivalent."""
    n, k = adj.shape
    neigh = adj[:, 1:].astype(np.int64) - 1
    valid = neigh >= 0
    rows = np.broadcast_to(np.arange(n)[:, None], neigh.shape)[valid]
    cols = neigh[valid]
    return rows, cols


def klist_degrees(adj: np.ndarray) -> np.ndarray:
    """True neighbour count per node (non-zero entries, incl. self slot —
    matches ``tf.count_nonzero(adj, 2)`` in the conv, model.py:436)."""
    return np.count_nonzero(adj, axis=-1)


def klist_to_coo(adj: np.ndarray, positions: np.ndarray) -> scipy.sparse.coo_matrix:
    """Position-weighted conversion: ``w_ij = 1/(1000·|c_i − c_j|)``
    (reference ``listToSparse``, utils.py:1718-1750)."""
    n = adj.shape[0]
    rows, cols = _klist_edges(adj)
    d = np.linalg.norm(positions[cols] - positions[rows], axis=-1)
    values = (1.0 / (1000.0 * d)).astype(np.float32)
    return scipy.sparse.coo_matrix((values, (rows, cols)), shape=(n, n))


def klist_to_coo_normal_weighted(
    adj: np.ndarray, positions: np.ndarray, normals: np.ndarray,
    sigma: float = 0.001,
) -> scipy.sparse.coo_matrix:
    """Normal+position weighted conversion used before coarsening:
    ``w_ij = max(⟨n_i, n_j⟩ · exp(−|c_i−c_j|²/(2σ²)), 0.001)`` with σ=0.001
    (reference ``listToSparseWNormals``, utils.py:1753-1796)."""
    n = adj.shape[0]
    rows, cols = _klist_edges(adj)
    dp = np.sum(normals[rows] * normals[cols], axis=-1)
    d2 = np.sum((positions[cols] - positions[rows]) ** 2, axis=-1)
    values = np.maximum(dp * np.exp(-d2 / (2.0 * sigma * sigma)), 0.001)
    return scipy.sparse.coo_matrix(
        (values.astype(np.float32), (rows, cols)), shape=(n, n)
    )


def coo_to_klist(adj: scipy.sparse.spmatrix, k: int) -> Tuple[np.ndarray, bool]:
    """Sparse matrix → one-indexed K-list with slot 0 = self; returns
    ``(klist, has_saturated)`` where saturation means some node had ≥ K
    neighbours and entries were dropped (reference ``sparseToList``,
    utils.py:1799-1827).

    Entry order follows the reference: COO storage order (row-major with
    ascending columns after CSR round-trip), diagonal skipped.
    """
    n = adj.shape[0]
    out = np.zeros((n, k), dtype=np.int32)
    out[:, 0] = np.arange(n, dtype=np.int32) + 1
    coo = adj.tocoo()
    rows, cols = coo.row.astype(np.int64), coo.col.astype(np.int64)
    off = rows != cols
    rows, cols = rows[off], cols[off]
    order = np.argsort(rows, kind="stable")
    rows, cols = rows[order], cols[order]
    if rows.size == 0:
        return out, False
    new = np.ones(rows.shape[0], dtype=bool)
    new[1:] = rows[1:] != rows[:-1]
    starts = np.flatnonzero(new)
    rank = np.arange(rows.shape[0]) - np.repeat(
        starts, np.diff(np.append(starts, rows.shape[0]))
    )
    keep = rank < (k - 1)
    out[rows[keep], rank[keep] + 1] = cols[keep] + 1
    return out, bool(np.any(~keep))


def dedupe_klist(adj: np.ndarray):
    """Collapse duplicate entries per row into (unique K-list, multiplicity).

    The facet K-list lists edge-shared neighbours twice (utils.py:243 comment);
    since the conv's per-edge assignment q depends only on (x_i, x_j), the
    duplicate slots carry identical weights and the aggregation
    ``Σ_slots q·x`` equals ``Σ_unique mult·q·x`` exactly. Gathering the unique
    list cuts gather rows by the duplicate fraction (~13% on facet graphs).

    Returns ``(adj_u [N, K'], mult [N, K'] float32)`` with K' = max distinct
    row count; ``mult`` is 0 on padding slots so degree =
    ``mult.sum(-1)`` = original non-zero count.
    """
    n, k = adj.shape
    adj32 = np.ascontiguousarray(adj, dtype=np.int32)
    # sort each row's entries (zeros first), count runs of equal values
    # (int32/int8 throughout — int64 temporaries double the memory traffic
    # of the preprocessing hot path on bandwidth-poor hosts)
    order = np.argsort(adj32, axis=1, kind="stable")
    sorted_adj = np.take_along_axis(adj32, order, axis=1)
    new = np.ones_like(sorted_adj, dtype=np.int8)
    np.not_equal(sorted_adj[:, 1:], sorted_adj[:, :-1], out=new[:, 1:].view(bool))
    valid = sorted_adj > 0
    new &= valid
    # unique rank per row
    rank = np.cumsum(new, axis=1, dtype=np.int32) - 1
    k_u = int(rank.max()) + 1 if n else 1
    adj_u = np.zeros((n, k_u), dtype=np.int32)
    rows = np.broadcast_to(np.arange(n, dtype=np.int64)[:, None], adj32.shape)
    rv, kv = rows[valid], rank[valid]
    # duplicates form runs of EQUAL values at equal (row, rank): a plain
    # fancy-index assignment (last write wins) is exact, unlike a general
    # scatter — and far cheaper than np.maximum.at's per-element ufunc loop
    adj_u[rv, kv] = sorted_adj[valid]
    flat = rv * k_u + kv
    mult = np.bincount(flat, minlength=n * k_u).reshape(n, k_u).astype(np.float32)
    return adj_u, mult


def split_self_klist(
    adj_u: np.ndarray, mult: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split the self slot out of a deduped K-list.

    Every K-list row contains the node itself (slot 0 convention of
    ``getFacesLargeAdj``/``sparseToList``, utils.py:262,1808). The self
    contribution to the conv needs no gather — its features are the row's own
    ``x`` — so the device op can compute it locally and gather one fewer row
    per node (~7-8% of gather rows at K'≈13).

    Returns ``(adj_nbr [N, K''], mult_nbr [N, K''], self_mult [N])`` where
    ``adj_nbr`` is the compacted neighbours-only one-indexed K-list (K'' =
    max non-self distinct count), ``mult_nbr`` its multiplicities, and
    ``self_mult`` the self multiplicity (1 for every real node; degree =
    ``mult_nbr.sum(-1) + self_mult`` equals the original non-zero count).
    """
    n, _ = adj_u.shape
    self_col = np.arange(n, dtype=np.int64) + 1
    is_self = adj_u.astype(np.int64) == self_col[:, None]
    self_mult = np.sum(mult * is_self, axis=1).astype(np.float32)
    nbr = np.where(is_self, 0, adj_u)
    m_n = np.where(is_self, 0.0, mult).astype(np.float32)
    # compact non-zero entries left (stable), trim to the max non-self count
    order = np.argsort(nbr == 0, axis=1, kind="stable")
    nbr = np.take_along_axis(nbr, order, axis=1)
    m_n = np.take_along_axis(m_n, order, axis=1)
    k_n = max(int(np.count_nonzero(nbr, axis=1).max()), 1) if n else 1
    return nbr[:, :k_n].astype(np.int32), m_n[:, :k_n], self_mult


def fused_mult_rows(mult_nbr: np.ndarray, self_mult: np.ndarray) -> np.ndarray:
    """Static per-slot multiplier for the node-minor conv: ``[K+1, N]`` with
    slot 0 = self, value = multiplicity × 1/degree (0 on padding slots).

    Folding the degree normalizer into the multiplicity is exact: the conv
    computes ``(1/deg)·Σ mult·q·x`` and both factors are static per graph.
    """
    deg = mult_nbr.sum(axis=1) + self_mult
    inv_deg = np.where(deg > 0, 1.0 / np.maximum(deg, 1.0), 0.0)
    rows = np.concatenate([self_mult[:, None], mult_nbr], axis=1) * inv_deg[:, None]
    return np.ascontiguousarray(rows.T.astype(np.float32))


def transpose_adjacency(adj: np.ndarray, num_targets: Optional[int] = None) -> np.ndarray:
    """Transpose slot map for scatter-free gather backward.

    For the one-indexed K-list ``adj`` [N, K], returns ``adj_t``
    [num_targets, K_t] (one-indexed flat slots, 0 = pad) where ``adj_t[j]``
    lists the flat slots ``i*K + k`` such that ``adj[i, k] == j+1``. The
    cotangent of ``x_nbr = x[adj]`` is then the *gather*
    ``dx[j] = Σ_k' g_flat[adj_t[j,k']]`` instead of an XLA scatter-add —
    scatters serialize on TPU, gathers don't.

    ``num_targets`` defaults to N (square source); pass the extended row
    count when ``adj`` indexes into a halo-extended feature array.

    K_t is the maximum in-slot count (= max node degree incl. duplicate
    edge-shared entries, so ≈ K for the facet graph).
    """
    n, k = adj.shape
    if num_targets is None:
        num_targets = n
    flat = adj.reshape(-1).astype(np.int32)          # one-indexed targets
    slots = np.arange(n * k, dtype=np.int32)
    valid = flat > 0
    targets = flat[valid] - 1
    slots = slots[valid]
    order = np.argsort(targets, kind="stable")
    targets, slots = targets[order], slots[order]
    if targets.size == 0:
        return np.zeros((num_targets, 1), dtype=np.int32)
    new = np.ones(targets.shape[0], dtype=bool)
    new[1:] = targets[1:] != targets[:-1]
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, targets.shape[0]))
    k_t = int(counts.max())
    rank = np.arange(targets.shape[0], dtype=np.int64) - np.repeat(starts, counts)
    adj_t = np.zeros((num_targets, k_t), dtype=np.int32)
    adj_t[targets, rank] = slots + 1
    return adj_t


def lane_tables(
    adj_nbr: np.ndarray, num_sources: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Index tables for the lane-axis (node-minor) gather.

    For the one-indexed neighbours-only K-list ``adj_nbr`` [N, K], returns
    ``(adjT [K, N], adjT_t [K_t, num_sources])``: ``adjT`` is the transposed
    K-list consumed by
    :func:`facet_graph_convolution_tpu.ops.gather.gather_neighbors_lane`,
    and ``adjT_t`` its transpose slot map with one-indexed FLAT slots over
    ``k·N + n`` (0 = pad) for the scatter-free backward. Both tables are
    node-axis-minor ([slots, nodes]) so BOTH gather directions keep their
    output node-minor without any in-graph table transpose (which would be
    recomputed per step whenever the table is itself selected per step, as
    in the DP patch bank). ``num_sources`` defaults to N; pass the
    halo-extended row count when ``adj_nbr`` indexes an extended feature
    array."""
    adjT = np.ascontiguousarray(adj_nbr.T.astype(np.int32))
    # transpose_adjacency flattens its [rows, cols] input row-major, so on
    # adjT ([K, N]) the emitted flat slots are exactly k·N + n
    adjT_t = transpose_adjacency(
        adjT,
        num_targets=adj_nbr.shape[0] if num_sources is None else num_sources,
    )
    return adjT, np.ascontiguousarray(adjT_t.T)


def lane_tables_pre(
    adj_nbr: np.ndarray, num_sources: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pre-derived lane gather tables: ``(adjT0, validF, idxT, validT)``.

    The lane gather's in-graph index math — ``max(adjT−1, 0)`` clamping,
    ``adjT_t > 0`` validity masks — is loop-INVARIANT for a fixed graph and
    hoisted out of scan bodies by XLA. When the tables are themselves
    *selected per step* from a stacked patch bank (DP / scanned multi-patch
    training), that math turns loop-variant and XLA re-materializes
    ~2.6 ms/step of it (measured, BASELINE.md DP row). Deriving it ONCE per
    patch here and ``jnp.take``-ing the derived arrays restores the
    loop-invariant cost profile.

    - ``adjT0`` [K, N] int32: zero-based clamped forward table
      (``max(adjT−1, 0)``; padding slots gather node 0's finite values).
    - ``validF`` [K, N] bool: forward padding mask — needed only by
      consumers that must see zeros in padding slots (the rotation-invariant
      feature path); the default conv's ``mult_rows`` zeroes padding q.
    - ``idxT`` [S, N] int32 / ``validT`` [S, N] bool: zero-based backward
      slot map + validity mask over flat ``k·N + n`` slots.
    """
    adjT, adjT_t = lane_tables(adj_nbr, num_sources)
    adjT0 = np.maximum(adjT - 1, 0).astype(np.int32)
    validF = adjT > 0
    idxT = np.maximum(adjT_t - 1, 0).astype(np.int32)
    validT = adjT_t > 0
    return adjT0, validF, idxT, validT


class WindowedLaneTables:
    """Per-block windowed lane-gather tables for HBM-scale graphs.

    At ~1M nodes the XLA gather row path degrades from 1.9 to ~11 ns/row —
    the operand no longer fits the on-chip working set and each row becomes
    an HBM-latency-bound access, insensitive to index locality (measured,
    BASELINE.md round 3). On a locality-ordered pyramid
    (``coarsen_graph(reorder="rcm")``) every node's neighbours lie within a
    narrow index band (±13k at 1.27M nodes on the bench torus), so gathering
    through a per-block ``dynamic_slice`` window restores ~2.2 ns/row: the
    window is re-laid-out once per block at streaming bandwidth and the
    random rows hit a small operand.

    Geometry (all static): output columns are covered by ``block``-wide
    slabs at stride ``block`` with the LAST slab clamped to ``N − block``
    (overlapping its predecessor — both compute identical values for the
    overlap columns, so order doesn't matter). ``window`` / ``bwd_window``
    are the max per-slab source spans, shared across slabs so the scan body
    has static shapes.

    - forward:  ``out[c, k, out_starts[b] + j] =
      x[c, win_starts[b] + relT[b, k, j]]`` (padding slots are index-clamped
      garbage — consumers must zero them via ``mult_rows``/``validF``);
    - backward: ``dx[c, out_starts[b] + j] = Σ_s
      g[c].reshape(K·N)[… bwd window …][relS[b, s, j]] · validS[b, s, j]``
      with ``relS`` flat over ``k·bwd_window + (n − bwd_starts[b])``.

    Halo-extended sources (D > 1 shards; ``num_sources > num_out``): the
    owned columns 0..N−1 are RCM-banded, the H halo columns live at the
    array TAIL, outside any band. Slots pointing at the tail carry a
    separate pack: ``not_tail`` zeroes their in-window clamped garbage,
    ``tailT`` (one-indexed into the tail, 0 elsewhere) gathers them from
    the small [C, H] tail block, and the backward adds a flat transpose
    gather ``tailS``/``tailV`` [S, H] over the k·N + n cotangent slots —
    the tail is ~halo-fraction-sized, so both extras are cheap. With
    ``num_sources == num_out`` (D == 1) the pack is absent and the tables
    are bit-identical to the pre-round-5 form.
    """

    def __init__(self, block, window, bwd_window, out_starts, win_starts,
                 relT, validF, bwd_starts, relS, validS, num_sources,
                 num_out, not_tail=None, tailT=None, tailS=None, tailV=None):
        self.block = int(block)
        self.window = int(window)
        self.bwd_window = int(bwd_window)
        self.out_starts = out_starts
        self.win_starts = win_starts
        self.relT = relT
        self.validF = validF
        self.bwd_starts = bwd_starts
        self.relS = relS
        self.validS = validS
        self.num_sources = int(num_sources)
        self.num_out = int(num_out)
        self.not_tail = not_tail
        self.tailT = tailT
        self.tailS = tailS
        self.tailV = tailV

    @property
    def has_tail(self):
        return self.num_sources > self.num_out

    @property
    def arrays(self):
        """The device-operand pack (jit arguments, in a fixed order)."""
        base = (self.out_starts, self.win_starts, self.relT, self.validF,
                self.bwd_starts, self.relS, self.validS)
        if self.has_tail:
            return base + (self.not_tail, self.tailT, self.tailS, self.tailV)
        return base

    @property
    def geometry(self):
        """Static descriptor consumed by ops.gather.make_windowed_lane_gather."""
        return (self.block, self.window, self.bwd_window,
                self.num_sources, self.num_out)


def _round_up(x: int, align: int) -> int:
    return ((int(x) + align - 1) // align) * align


def windowed_lane_tables(
    adj_nbr: np.ndarray,
    num_sources: Optional[int] = None,
    block: int = 32768,
    align: int = 512,
    max_window_ratio: float = 8.0,
    window: Optional[int] = None,
    bwd_window: Optional[int] = None,
    tables: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> Optional[WindowedLaneTables]:
    """Build :class:`WindowedLaneTables` from the neighbours-only one-indexed
    K-list ``adj_nbr`` [N, K].

    ``num_sources > N`` builds the halo-tail pack (sharded levels, D > 1):
    entries ≤ N ride the banded windows, entries > N gather from the [C, H]
    extended-array tail. Pass ``tables`` = precomputed one-indexed
    ``(adjT [K, N], adjT_t [S, ext])`` (e.g. a LevelPartition's
    ``lane_adj[d]``/``lane_adj_t[d]``) to reuse the partition's uniform
    slot widths instead of re-deriving them per shard.

    Returns ``None`` when windowing cannot help: fewer than two blocks, or
    no index locality among the OWNED entries (a window exceeding
    ``max_window_ratio × block``, e.g. a pyramid built without
    ``reorder="rcm"``) — callers then fall back to the flat lane gather.
    """
    if tables is not None:
        adjT, adjT_t = tables
        n = adjT.shape[1]
    else:
        n = adj_nbr.shape[0]
    nsrc = n if num_sources is None else num_sources
    if n < 2 * block or nsrc < n:
        return None
    if tables is not None:
        adjT0 = np.maximum(adjT - 1, 0).astype(np.int32)
        validF = adjT > 0
        idxT = np.maximum(adjT_t - 1, 0).astype(np.int32)
        validT = adjT_t > 0
    else:
        adjT0, validF, idxT, validT = lane_tables_pre(adj_nbr, num_sources)
    k, _ = adjT0.shape
    # the backward's flat slot space (k·N + n) is int32-indexed, same cap as
    # the flat lane tables — guard it here too rather than overflow silently
    assert k * n < 2**31, (k, n)
    s = idxT.shape[0]
    owned = validF & (adjT0 < n)                 # in-band (non-tail) entries

    out_starts = np.arange(0, n - block + 1, block, dtype=np.int32)
    if int(out_starts[-1]) != n - block:
        out_starts = np.append(out_starts, np.int32(n - block))
    nblk = out_starts.shape[0]

    # forward geometry: per-slab min/max over VALID OWNED neighbour indices
    def spans(idx2d, valid2d):
        lo = np.full(nblk, 0, np.int64)
        hi = np.full(nblk, 0, np.int64)
        for b, st in enumerate(out_starts):
            sub = idx2d[:, st : st + block]
            va = valid2d[:, st : st + block]
            if va.any():
                vals = sub[va]
                lo[b], hi[b] = int(vals.min()), int(vals.max())
        return lo, hi

    f_lo, f_hi = spans(adjT0, owned)
    needed = min(_round_up(int((f_hi - f_lo).max()) + 1, align), n)
    if needed > max_window_ratio * block:
        return None
    # ``window``/``bwd_window`` force a LARGER span than this mesh needs —
    # multi-mesh compile reuse pins the static geometry to the max across
    # meshes (parallel.halo.unify_level_windows); any window ≥ needed is
    # correct (win_starts clipping keeps every neighbour in range)
    window = min(max(needed, window or 0), n)
    win_starts = np.clip(f_lo, 0, n - window).astype(np.int32)

    # backward geometry over the n component of the flat k·N + n slots,
    # restricted to the OWNED source columns (the tail's slots ride the
    # separate flat transpose pack below)
    k_arr = (idxT // n).astype(np.int64)
    n_arr = (idxT % n).astype(np.int64)
    b_lo, b_hi = spans(n_arr[:, :n], validT[:, :n])
    bwd_needed = min(_round_up(int((b_hi - b_lo).max()) + 1, align), n)
    if bwd_needed > max_window_ratio * block:
        return None
    bwd_window = min(max(bwd_needed, bwd_window or 0), n)
    bwd_starts = np.clip(b_lo, 0, n - bwd_window).astype(np.int32)

    relT = np.empty((nblk, k, block), np.int32)
    vF = np.empty((nblk, k, block), bool)
    relS = np.empty((nblk, s, block), np.int32)
    vS = np.empty((nblk, s, block), bool)
    for b, st in enumerate(out_starts):
        cols = slice(int(st), int(st) + block)
        relT[b] = np.clip(adjT0[:, cols] - win_starts[b], 0, window - 1)
        vF[b] = owned[:, cols]
        flat = k_arr[:, cols] * bwd_window + (n_arr[:, cols] - bwd_starts[b])
        relS[b] = np.clip(flat, 0, k * bwd_window - 1)
        vS[b] = validT[:, cols]
    kw = {}
    if nsrc > n:
        # tail pack: forward masks + one-indexed tail gather table, and the
        # flat transpose slots of the tail sources for the backward
        not_tail = np.empty((nblk, k, block), bool)
        tailT = np.empty((nblk, k, block), np.int32)
        tail_idx = np.where(owned | ~validF, 0, adjT0 - n + 1)   # one-indexed
        for b, st in enumerate(out_starts):
            cols = slice(int(st), int(st) + block)
            not_tail[b] = owned[:, cols] | ~validF[:, cols]
            tailT[b] = tail_idx[:, cols]
        kw = dict(
            not_tail=not_tail, tailT=tailT,
            tailS=np.ascontiguousarray(idxT[:, n:]),
            tailV=np.ascontiguousarray(validT[:, n:]),
        )
    return WindowedLaneTables(
        block=block, window=window, bwd_window=bwd_window,
        out_starts=out_starts, win_starts=win_starts, relT=relT, validF=vF,
        bwd_starts=bwd_starts, relS=relS, validS=vS,
        num_sources=nsrc, num_out=n, **kw,
    )


def invert_permutation(perm: np.ndarray) -> np.ndarray:
    """Inverse permutation, sized to cover max(len, max+1) like the reference
    ``inv_perm`` (utils.py:1830-1835)."""
    perm = np.asarray(perm, dtype=np.int64)
    size = max(perm.shape[0], int(perm.max()) + 1) if perm.size else 0
    inv = np.zeros(size, dtype=np.int64)
    inv[perm] = np.arange(perm.shape[0])
    return inv
