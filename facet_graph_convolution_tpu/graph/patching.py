"""BFS patch extraction over the facet graph.

Parity targets: ``getGraphPatch`` (utils.py:1417-1502), ``getGraphPatch_wMask``
(utils.py:1508-1696), ``getMeshPatch`` (utils.py:1298-1411).

These grow a patch from a seed face by breadth-first traversal of the K-list
adjacency, remap nodes to local indices, and rebuild a consistent local
K-list. The masked variant never regrows into already-covered territory but
keeps growing past the mask up to ``min_size`` for receptive-field context,
and reports a seed for the next patch.

Sequential BFS; a C++ fast path lives in
:mod:`facet_graph_convolution_tpu.graph.native`.
"""

from __future__ import annotations

from collections import deque
from typing import Optional, Tuple

import numpy as np


def grow_graph_patch(
    adj: np.ndarray, nodes_num: int, seed: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Grow a patch of up to ``nodes_num`` nodes (reference ``getGraphPatch``,
    utils.py:1417-1502). Returns (local one-indexed K-list, local→global map).
    """
    patch_adj, old_idx, _ = grow_graph_patch_masked(
        adj, nodes_num, seed, mask=None, min_size=0
    )
    return patch_adj, old_idx


def grow_graph_patch_masked(
    adj: np.ndarray,
    nodes_num: int,
    seed: int,
    mask: Optional[np.ndarray],
    min_size: int,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Masked BFS patch growth (reference ``getGraphPatch_wMask``,
    utils.py:1508-1696).

    - BFS from ``seed`` up to ``nodes_num`` nodes; nodes with ``mask==1``
      (already covered by a previous patch) are added when reached but not
      expanded — they go to a border queue (utils.py:1558-1563).
    - If the unmasked region fills up below ``min_size``, growth continues
      through the border queue, ignoring the mask, to guarantee a minimum
      receptive field (utils.py:1572-1628).
    - Returns (local K-list one-indexed, local→global indices, next seed):
      the next seed is an unvisited, unmasked neighbour seen while completing
      border adjacency (utils.py:1653-1656), or −1.
    """
    try:
        from facet_graph_convolution_tpu.graph.native import grow_patch_native

        return grow_patch_native(adj, nodes_num, seed, mask, min_size)
    except Exception:
        pass

    k = adj.shape[1]
    total = adj.shape[0]
    adj0 = adj.astype(np.int64) - 1          # zero-indexed, -1 = pad
    use_mask = mask if mask is not None else np.zeros(total, dtype=np.int8)

    # BFS can overshoot either limit by < K when expanding a neighbourhood;
    # min_size may exceed nodes_num (the reference sizes for nodes_num + K
    # only, utils.py:1511, assuming min ≤ max).
    cap = min(max(nodes_num, min_size) + k, total)
    new_idx = np.full(total, -1, dtype=np.int64)
    old_idx = np.full(cap, -1, dtype=np.int64)
    out_adj = np.full((cap, k), -1, dtype=np.int64)
    count = 0

    def add_node(g: int) -> int:
        nonlocal count
        new_idx[g] = count
        old_idx[count] = g
        count += 1
        return count - 1

    main_q: deque = deque()
    border_q: deque = deque()
    add_node(seed)
    main_q.append(seed)

    def expand(queue: deque, limit: int, respect_mask: bool) -> None:
        nonlocal count
        while count < limit and queue:
            cur = queue.popleft()
            local = new_idx[cur]
            out_adj[local, 0] = local
            for slot in range(1, k):
                nbr = adj0[cur, slot]
                if nbr == -1:
                    break
                if new_idx[nbr] == -1:
                    add_node(nbr)
                    if respect_mask and use_mask[nbr] == 1:
                        border_q.append(nbr)
                    else:
                        main_q.append(nbr)
                out_adj[local, slot] = new_idx[nbr]

    expand(main_q, nodes_num, respect_mask=True)

    if count < min_size:
        # unmasked region exhausted: keep growing through the border for
        # receptive-field context (utils.py:1572-1628)
        expand(border_q, min_size, respect_mask=False)
        expand(main_q, min_size, respect_mask=False)

    # complete adjacency rows of the remaining frontier without growing
    next_seed = -1
    for queue in (main_q, border_q):
        while queue:
            cur = queue.popleft()
            local = new_idx[cur]
            out_adj[local, 0] = local
            fill = 1
            for slot in range(1, k):
                nbr = adj0[cur, slot]
                if nbr == -1:
                    break
                if new_idx[nbr] == -1:
                    if use_mask[nbr] == 0:
                        next_seed = int(nbr)
                    continue
                out_adj[local, fill] = new_idx[nbr]
                fill += 1

    out_adj = out_adj[:count] + 1            # back to one-indexed, pad → 0
    return out_adj.astype(np.int32), old_idx[:count], next_seed


def grow_mesh_patch(
    vertices: np.ndarray,
    faces: np.ndarray,
    adj: np.ndarray,
    face_num: int,
    seed: int,
):
    """Vertices+faces patch growth (reference ``getMeshPatch``,
    utils.py:1298-1411). Returns (patch vertices, patch faces re-indexed,
    patch K-list, vertex local→global, face local→global)."""
    patch_adj, f_old, _ = grow_graph_patch_masked(adj, face_num, seed, None, 0)
    faces = np.asarray(faces, dtype=np.int64)
    sel_faces = faces[f_old]
    # vertex remap in first-appearance order (matches reference addVertex
    # walk over faces, utils.py:1319-1342)
    flat = sel_faces.reshape(-1)
    uniq, first_pos = np.unique(flat, return_index=True)
    order = np.argsort(first_pos)
    v_old = uniq[order]
    v_new = np.full(int(faces.max()) + 1, -1, dtype=np.int64)
    v_new[v_old] = np.arange(v_old.shape[0])
    patch_faces = v_new[sel_faces]
    patch_vertices = np.asarray(vertices)[v_old]
    return patch_vertices, patch_faces.astype(np.int32), patch_adj, v_old, f_old
