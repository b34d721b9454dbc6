"""Sharded vertex solver: edge-map Taubin filtering over partitioned vertices.

Completes whole-mesh multi-chip inference: after the halo-exchange U-Net
predicts facet normals (`parallel/halo.py`), the vertex positions are refined
by the same solver the reference unrolls on one device
(``update_position2``, train.py:1467-1557) — here the VERTEX space is
partitioned into D contiguous blocks and each solver iteration exchanges the
boundary vertex positions over ICI before the edge-endpoint gathers.

The per-vertex face normals are static across iterations, so they are
gathered once on the host and sharded; only the moving positions ride the
per-iteration halo exchange. Padding slots carry zero normals (the pad edge
resolves to the prepended zero edge-map line whose faces hit the zero normal
row), so their contribution vanishes exactly as in the single-device solver.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from facet_graph_convolution_tpu.ops.normalization import dot_last


@dataclasses.dataclass
class VertexPartition:
    """Partition of a per-vertex gather map ``idx [V, ...]`` (0-indexed
    global vertex ids, −1 = pad) into D blocks with halo exchange tables —
    the structure of :class:`parallel.halo.LevelPartition` generalized to an
    arbitrary-shaped index map."""

    num_vertices: int
    block: int
    offsets: Tuple[int, ...]
    local_idx: np.ndarray            # [D, block, ...] one-indexed into ext, 0 = pad
    send_idx: np.ndarray             # [D, num_off, H]
    recv_mask: np.ndarray            # [D, num_off, H]
    halo_size: int
    pad_rows: int                    # rows appended so D divides V


def partition_index_map(
    idx: np.ndarray,
    num_shards: int,
    producer_count: Optional[int] = None,
) -> VertexPartition:
    """Build halo tables for a per-row gather map.

    Rows of ``idx`` are the CONSUMERS (padded to a multiple of D with inert
    −1 rows); the ids reference the PRODUCER space, by default the same set
    as the consumers. Pass ``producer_count`` (must be divisible by D) for
    cross-space gathers — e.g. faces gathering vertex positions: each device
    then holds consumer block d AND producer block d, and ``send_idx``
    indexes the *producer* block."""
    v = idx.shape[0]
    pad_rows = (-v) % num_shards
    if pad_rows:
        pad = np.full((pad_rows,) + idx.shape[1:], -1, dtype=idx.dtype)
        idx = np.concatenate([idx, pad], axis=0)
    v_tot = idx.shape[0]
    cons_block = v_tot // num_shards
    if producer_count is None:
        producer_count = v_tot
    assert producer_count % num_shards == 0, (producer_count, num_shards)
    block = producer_count // num_shards          # producer block
    flat = idx.reshape(v_tot, -1).astype(np.int64)
    owner = lambda g: g // block

    requested, offsets_set = [], set()
    for s in range(num_shards):
        rows = flat[s * cons_block : (s + 1) * cons_block]
        valid = rows[rows >= 0]
        remote = np.unique(valid[(valid < s * block) | (valid >= (s + 1) * block)])
        groups = {}
        owners = owner(remote)
        # remote is sorted ⇒ owners non-decreasing: split at owner boundaries
        bounds = np.searchsorted(owners, np.arange(num_shards + 1))
        for o in np.unique(owners):
            o = int(o)
            groups[o - s] = remote[bounds[o] : bounds[o + 1]]
            offsets_set.add(o - s)
        requested.append(groups)

    offsets = tuple(sorted(offsets_set, key=lambda d: (abs(d), d)))
    halo = max(
        [len(requested[s].get(d, ())) for s in range(num_shards) for d in offsets]
        or [0]
    )
    halo = max(halo, 1)
    num_off = max(len(offsets), 1)

    send_idx = np.zeros((num_shards, num_off, halo), dtype=np.int32)
    recv_mask = np.zeros((num_shards, num_off, halo), dtype=np.float32)
    local_idx = np.zeros((num_shards, cons_block, flat.shape[1]), dtype=np.int32)

    # dense producer-id → extended-slot remap reused across shards (each
    # shard refills exactly the ids it will read) — replaces the per-remote
    # -entry dict loop, same vectorization as parallel/halo._partition_level
    slot_map = np.zeros(producer_count, dtype=np.int64)
    for s in range(num_shards):
        for j, d in enumerate(offsets):
            req = requested[s].get(d, np.zeros(0, np.int64))
            slot_map[req] = block + j * halo + np.arange(len(req))
            recv_mask[s, j, : len(req)] = 1.0
        for j, d in enumerate(offsets):
            src = s + d
            if 0 <= src < num_shards:
                req = requested[s].get(d, np.zeros(0, np.int64))
                send_idx[src, j, : len(req)] = req - src * block

        rows = flat[s * cons_block : (s + 1) * cons_block]
        out = np.zeros_like(rows)
        own = (rows >= s * block) & (rows < (s + 1) * block)
        out[own] = rows[own] - s * block + 1
        remote_mask = (rows >= 0) & ~own
        out[remote_mask] = slot_map[rows[remote_mask]] + 1
        local_idx[s] = out

    return VertexPartition(
        num_vertices=v,
        block=block,
        offsets=offsets,
        local_idx=local_idx.reshape((num_shards, cons_block) + idx.shape[1:]),
        send_idx=send_idx,
        recv_mask=recv_mask,
        halo_size=halo,
        pad_rows=pad_rows,
    )


def sharded_update_positions_edges(
    x: np.ndarray,                    # [V, 3] vertex positions (host)
    face_normals: np.ndarray,         # [F, 3]
    edge_map: np.ndarray,             # [E, 4]
    v_edges: np.ndarray,              # [V, maxE]
    mesh: Mesh,
    axis: str = "graph",
    iter_num: int = 60,
    lmbd=1.0 / 18.0,
    adaptive_tol: float = 0.0,
    trust: float = 0.0,
) -> np.ndarray:
    """Multi-chip
    :func:`facet_graph_convolution_tpu.ops.vertex_update.update_positions_edges`:
    identical math, vertex-partitioned with a per-iteration boundary
    exchange. ``lmbd="degree"``, ``adaptive_tol`` and ``trust`` mirror the
    single-device solver's round-5 options (per-vertex 1/(3·deg) step;
    residual-plateau stop — the stop decision uses the ``psum``-global
    residual, so every shard exits on the same iteration; per-vertex
    displacement trust cap — purely shard-local). The psum's reduction
    order differs from the single-device sum, so when an iteration's
    relative improvement lands within fp rounding of ``adaptive_tol`` the
    two paths may stop one iteration apart — parity tests use generic
    meshes where the margin is far from the threshold. Returns the
    refined [V, 3] positions."""
    n_dev = mesh.shape[axis]
    v = x.shape[0]

    # host-side setup mirroring the single-device solver
    v_edges1 = v_edges.astype(np.int64) + 1
    emap = edge_map.astype(np.int64) + np.array([[0, 0, 1, 1]])
    emap = np.concatenate([np.zeros((1, 4), np.int64), emap], axis=0)
    fn_pad = np.concatenate(
        [np.zeros((1, 3), np.float32), np.asarray(face_normals, np.float32)],
        axis=0,
    )
    n_edges = emap[v_edges1]                      # [V, maxE, 4]
    # endpoints: pad edges resolve to vertex 0 in the single-device solver;
    # their normals are zero either way, so mark them −1 (masked zero
    # position) to keep the halo small — the contribution is zero in both.
    is_pad = v_edges[..., None] < 0
    v_pair_idx = np.where(
        np.broadcast_to(is_pad, n_edges[..., 0:2].shape),
        -1,
        n_edges[..., 0:2],
    )
    n_f = fn_pad[n_edges[..., 2:4]]               # [V, maxE, 2, 3] static

    part = partition_index_map(v_pair_idx, n_dev)
    block, pad_rows = part.block, part.pad_rows
    x_padded = np.concatenate(
        [np.asarray(x, np.float32), np.zeros((pad_rows, 3), np.float32)], axis=0
    )
    n_f_padded = np.concatenate(
        [n_f.astype(np.float32),
         np.zeros((pad_rows,) + n_f.shape[1:], np.float32)],
        axis=0,
    )
    if isinstance(lmbd, str):
        if lmbd != "degree":
            raise ValueError(f"unknown lmbd mode {lmbd!r}")
        deg = np.sum(np.asarray(v_edges) >= 0, axis=1).astype(np.float32)
        lam = np.where(deg > 0, 1.0 / (3.0 * np.maximum(deg, 1.0)), 0.0)
        lam = np.concatenate([lam, np.zeros(pad_rows, np.float32)])
        lmbd_sh = jnp.asarray(lam.reshape(n_dev, block, 1))
    else:
        lmbd_sh = jnp.full((n_dev, block, 1), float(lmbd), jnp.float32)

    local_idx = jnp.asarray(part.local_idx)       # [D, block, maxE, 2]
    send_idx = jnp.asarray(part.send_idx)
    recv_mask = jnp.asarray(part.recv_mask)
    n_f_sh = jnp.asarray(n_f_padded.reshape((n_dev, block) + n_f.shape[1:]))
    offsets = part.offsets

    def _halo_extend(x_local, send_block, recv_block):
        parts = [x_local]
        size = jax.lax.axis_size(axis)
        for j, d in enumerate(offsets):
            rows = jnp.take(x_local, send_block[j], axis=0)
            perm = [(src, (src - d) % size) for src in range(size)]
            received = jax.lax.ppermute(rows, axis, perm)
            parts.append(received * recv_block[j][:, None])
        return jnp.concatenate(parts, axis=0)

    in_specs = (P(axis), P(axis), P(axis), P(axis), P(axis), P(axis))

    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=P(axis))
    def solve(x_block, idx_block, n_f_block, send_block, recv_block, lmb_block):
        idx_b = idx_block[0]          # operands carry a leading shard dim of 1
        n_f_b = n_f_block[0]
        send_b = send_block[0]
        recv_b = recv_block[0]
        lmb = lmb_block[0]
        x0 = x_block

        def _proj(x_loc):
            x_ext = _halo_extend(x_loc, send_b, recv_b)
            ext_pad = jnp.concatenate([jnp.zeros_like(x_ext[:1]), x_ext], axis=0)
            xv = jnp.take(ext_pad, idx_b, axis=0)  # [block, maxE, 2, 3]
            e_vec = xv - x_loc[:, None, None, :]
            s = jnp.sum(e_vec, axis=2)             # [block, maxE, 3]
            return dot_last(n_f_b, s[:, :, None, :])

        if trust > 0.0:
            p0 = _proj(x_block)
            cnt = jnp.maximum(
                2.0 * jnp.sum((idx_b[..., 0] > 0).astype(x_block.dtype),
                              axis=-1), 1.0)
            cap = trust * jnp.sqrt(
                jnp.sum(jnp.square(p0), axis=(1, 2)) / cnt)

        def step(x_loc):
            proj = _proj(x_loc)
            update = jnp.sum(n_f_b * proj[..., None], axis=(1, 2))
            r = jax.lax.psum(jnp.sum(jnp.square(proj)), axis)
            x_new = x_loc + lmb * update
            if trust > 0.0:
                d = x_new - x0
                dn = jnp.linalg.norm(d, axis=1, keepdims=True)
                x_new = x0 + d * jnp.minimum(
                    1.0, cap[:, None] / jnp.maximum(dn, 1e-12))
            return x_new, r

        if adaptive_tol > 0.0:
            big = jnp.asarray(1e30, x_block.dtype)

            def cond(carry):
                _, r_pp, r_p, i = carry
                return jnp.logical_and(
                    i < iter_num, (r_pp - r_p) > adaptive_tol * r_p)

            def w_body(carry):
                x_loc, _, r_p, i = carry
                x_new, r = step(x_loc)
                return x_new, r_p, r, i + 1

            out, _, _, _ = jax.lax.while_loop(
                cond, w_body,
                (x_block, big, big * 0.09, jnp.asarray(0, jnp.int32)))
            return out

        def body(_, x_loc):
            return step(x_loc)[0]

        return jax.lax.fori_loop(0, iter_num, body, x_block)

    with mesh:
        out = jax.jit(solve)(
            jnp.asarray(x_padded), local_idx, n_f_sh, send_idx, recv_mask,
            lmbd_sh,
        )
    return np.asarray(out)[:v]


def sharded_update_positions_multiscale(
    x: np.ndarray,                    # [V, 3]
    face_normals_list,                # fine→coarse [F, 3], [F/4, 3], [F/16, 3]
    faces: np.ndarray,                # [F, 3] tree-ordered, −1 = fake
    v_faces: np.ndarray,              # [V, K]
    mesh: Mesh,
    axis: str = "graph",
    coarsening_steps: int = 2,
    iter_nums=(80, 20, 20),
    ):
    """Multi-chip
    :func:`facet_graph_convolution_tpu.ops.vertex_update.update_positions_multiscale`:
    vertices AND faces are partitioned; every solver iteration runs two halo
    exchanges — vertex positions to the face shards (centroid recomputation)
    and current-scale face centers back to the vertex shards. Math matches
    the single-device solver exactly (fake faces ride the zero-row gathers on
    both sides). Returns (x [V, 3], dx list coarse-first)."""
    from facet_graph_convolution_tpu.ops.pooling import tree_pool

    n_dev = mesh.shape[axis]
    levels = len(face_normals_list)
    group = 2 ** coarsening_steps
    v = x.shape[0]
    f = faces.shape[0]

    # pad faces so every pyramid level splits evenly across shards
    f_align = n_dev * group ** (levels - 1)
    f_pad = (-f) % f_align
    faces_p = np.concatenate(
        [faces.astype(np.int64), np.full((f_pad, 3), -1, dtype=np.int64)], axis=0
    )
    fb = (f + f_pad) // n_dev

    # vertex padding to a multiple of D
    v_pad = (-v) % n_dev
    vb = (v + v_pad) // n_dev
    x_p = np.concatenate(
        [np.asarray(x, np.float32), np.zeros((v_pad, 3), np.float32)], axis=0
    )
    v_faces_p = np.concatenate(
        [v_faces.astype(np.int64),
         np.full((v_pad, v_faces.shape[1]), -1, dtype=np.int64)], axis=0
    )

    # per-vertex step size from the ORIGINAL incidence (train.py:1676-1683)
    counts = np.sum(v_faces_p >= 0, axis=1).astype(np.float32)
    lmbd = np.where(counts > 0, 1.0 / np.maximum(counts, 1.0), 0.0)[:, None]
    lmbd_sh = jnp.asarray(lmbd.reshape(n_dev, vb, 1))

    # faces → vertices gather (corner positions), rebuilt each iteration
    p_fv = partition_index_map(faces_p, n_dev, producer_count=(v + v_pad))
    fv_local = jnp.asarray(p_fv.local_idx)             # [D, fb, 3]
    fv_send = jnp.asarray(p_fv.send_idx)
    fv_recv = jnp.asarray(p_fv.recv_mask)
    fv_offsets = p_fv.offsets

    # vertices → scale-s face centers gathers + static per-vertex normals
    p_vf, vf_locals, vf_sends, vf_recvs, vf_offsets, v_fns = [], [], [], [], [], []
    fn_shards = []
    for s in range(levels):
        divisor = group ** s
        idx_s = np.where(v_faces_p >= 0, v_faces_p // divisor, -1)
        part = partition_index_map(
            idx_s, n_dev, producer_count=(f + f_pad) // divisor
        )
        p_vf.append(part)
        vf_locals.append(jnp.asarray(part.local_idx))   # [D, vb, K]
        vf_sends.append(jnp.asarray(part.send_idx))
        vf_recvs.append(jnp.asarray(part.recv_mask))
        vf_offsets.append(part.offsets)

        fn_s = np.asarray(face_normals_list[s], np.float32).reshape(-1, 3)
        fn_pad_s = np.concatenate([np.zeros((1, 3), np.float32), fn_s], axis=0)
        safe_idx = np.where(idx_s >= 0, idx_s + 1, 0)
        vfn = fn_pad_s[np.clip(safe_idx, 0, fn_pad_s.shape[0] - 1)]
        v_fns.append(jnp.asarray(vfn.reshape(n_dev, vb, v_faces.shape[1], 3)))
        # normals on the FACE shards too, for the per-face scalar ⟨n_f, c_f⟩
        # (appended pad faces get zero normals — their t is 0 either way)
        total_s = (f + f_pad) // divisor
        fn_full = np.zeros((total_s, 3), np.float32)
        fn_full[: fn_s.shape[0]] = fn_s
        fn_shards.append(jnp.asarray(fn_full.reshape(n_dev, total_s // n_dev, 3)))

    def _exchange(data_local, send_b, recv_b, offsets):
        parts = [data_local]
        size = jax.lax.axis_size(axis)
        for j, d in enumerate(offsets):
            rows = jnp.take(data_local, send_b[j], axis=0)
            perm = [(src, (src - d) % size) for src in range(size)]
            received = jax.lax.ppermute(rows, axis, perm)
            parts.append(received * recv_b[j][:, None])
        return jnp.concatenate(parts, axis=0)

    spec = P(axis)
    in_specs = (
        spec,                                  # x
        spec, spec, spec,                      # fv local/send/recv
        tuple(spec for _ in range(levels)),    # vf locals
        tuple(spec for _ in range(levels)),    # vf sends
        tuple(spec for _ in range(levels)),    # vf recvs
        tuple(spec for _ in range(levels)),    # v_fns
        tuple(spec for _ in range(levels)),    # fn per face shard
        spec,                                  # lmbd
    )
    out_specs = (spec, tuple(spec for _ in range(levels)))

    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    def solve(x_b, fv_l, fv_s, fv_r, vf_ls, vf_ss, vf_rs, vfn_s, fn_s, lmb):
        fv_l, fv_s, fv_r, lmb = fv_l[0], fv_s[0], fv_r[0], lmb[0]
        vf_ls = tuple(a[0] for a in vf_ls)
        vf_ss = tuple(a[0] for a in vf_ss)
        vf_rs = tuple(a[0] for a in vf_rs)
        vfn_s = tuple(a[0] for a in vfn_s)
        fn_s = tuple(a[0] for a in fn_s)

        dx_out = []
        for s in range(levels):
            cur = levels - 1 - s
            v_fn = vfn_s[cur]

            def body(_, x_loc, cur=cur, v_fn=v_fn, fn_cur=fn_s[cur]):
                # stage 1: face shards recompute centroids from vertices
                x_ext = _exchange(x_loc, fv_s, fv_r, fv_offsets)
                ext_pad = jnp.concatenate(
                    [jnp.zeros_like(x_ext[:1]), x_ext], axis=0
                )
                corners = jnp.take(ext_pad, fv_l, axis=0)    # [fb, 3, 3]
                fpos = jnp.mean(corners, axis=1)             # fake → 0
                if cur > 0:
                    fpos = tree_pool(
                        fpos, steps=coarsening_steps * cur,
                        mode="avg_ignore_zeros",
                    )
                # stage 2: vertex shards gather the per-face SCALAR
                # t_f = ⟨n_f, c_f⟩ (⟨n, c − x⟩ distributed — same trick as
                # the single-device solver): 3× less exchange + gather bytes
                t_loc = jnp.sum(fn_cur * fpos, axis=-1, keepdims=True)
                t_ext = _exchange(t_loc, vf_ss[cur], vf_rs[cur], vf_offsets[cur])
                t_pad = jnp.concatenate(
                    [jnp.zeros_like(t_ext[:1]), t_ext], axis=0
                )
                t_vk = jnp.take(t_pad, vf_ls[cur], axis=0)[..., 0]  # [vb, K]
                n_w = t_vk - dot_last(v_fn, x_loc[:, None, :])
                update = jnp.sum(n_w[..., None] * v_fn, axis=1)
                return x_loc + lmb * update

            x_init = x_b
            x_b = jax.lax.fori_loop(0, int(iter_nums[s]), body, x_b)
            dx_out.append(x_b - x_init)
        return x_b, tuple(dx_out)

    with mesh:
        out, dx = jax.jit(solve)(
            jnp.asarray(x_p), fv_local, fv_send, fv_recv,
            tuple(vf_locals), tuple(vf_sends), tuple(vf_recvs),
            tuple(v_fns), tuple(fn_shards), lmbd_sh,
        )
    out = np.asarray(out)[:v]
    dx = [np.asarray(d)[:v] for d in dx]
    return out, dx


# ---------------------------------------------------------------------------
# Differentiable in-shard_map pieces for sharded end-to-end training
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class MultiscaleSolverOperands:
    """Host-built operands for the sharded multi-scale solver, shaped [D, ...]
    for shard_map consumption. Build with :func:`prepare_multiscale_solver`."""

    num_vertices: int
    num_faces: int
    v_block: int
    f_block: int
    fv_local: jnp.ndarray
    fv_send: jnp.ndarray
    fv_recv: jnp.ndarray
    fv_offsets: Tuple[int, ...]
    vf_locals: Tuple[jnp.ndarray, ...]
    vf_sends: Tuple[jnp.ndarray, ...]
    vf_recvs: Tuple[jnp.ndarray, ...]
    vf_offsets: Tuple[Tuple[int, ...], ...]
    lmbd: jnp.ndarray

    def device_operands(self):
        """The array pytree to pass through shard_map (specs: all P(axis))."""
        return (
            self.fv_local, self.fv_send, self.fv_recv,
            self.vf_locals, self.vf_sends, self.vf_recvs,
            self.lmbd,
        )


def prepare_multiscale_solver(
    face_normals_shapes,              # per-level face counts, fine→coarse
    faces: np.ndarray,
    v_faces: np.ndarray,
    num_vertices: int,
    num_shards: int,
    coarsening_steps: int = 2,
) -> MultiscaleSolverOperands:
    levels = len(face_normals_shapes)
    group = 2 ** coarsening_steps
    f = faces.shape[0]
    f_align = num_shards * group ** (levels - 1)
    assert f % f_align == 0, (f, f_align, "pad faces before partitioning")
    assert num_vertices % num_shards == 0, (num_vertices, num_shards)
    fb = f // num_shards
    vb = num_vertices // num_shards

    counts = np.sum(v_faces >= 0, axis=1).astype(np.float32)
    lmbd = np.where(counts > 0, 1.0 / np.maximum(counts, 1.0), 0.0)[:, None]

    p_fv = partition_index_map(
        faces.astype(np.int64), num_shards, producer_count=num_vertices
    )
    vf_locals, vf_sends, vf_recvs, vf_offs = [], [], [], []
    for s in range(levels):
        divisor = group ** s
        idx_s = np.where(v_faces >= 0, v_faces.astype(np.int64) // divisor, -1)
        part = partition_index_map(idx_s, num_shards, producer_count=f // divisor)
        vf_locals.append(jnp.asarray(part.local_idx))
        vf_sends.append(jnp.asarray(part.send_idx))
        vf_recvs.append(jnp.asarray(part.recv_mask))
        vf_offs.append(part.offsets)

    return MultiscaleSolverOperands(
        num_vertices=num_vertices,
        num_faces=f,
        v_block=vb,
        f_block=fb,
        fv_local=jnp.asarray(p_fv.local_idx),
        fv_send=jnp.asarray(p_fv.send_idx),
        fv_recv=jnp.asarray(p_fv.recv_mask),
        fv_offsets=p_fv.offsets,
        vf_locals=tuple(vf_locals),
        vf_sends=tuple(vf_sends),
        vf_recvs=tuple(vf_recvs),
        vf_offsets=tuple(vf_offs),
        lmbd=jnp.asarray(lmbd.reshape(num_shards, vb, 1)),
    )


def _exchange_rows(data_local, send_b, recv_b, offsets, axis):
    """Generic producer→consumer halo exchange (ppermute ring hops)."""
    parts = [data_local]
    size = jax.lax.axis_size(axis)
    for j, d in enumerate(offsets):
        rows = jnp.take(data_local, send_b[j], axis=0)
        perm = [(src, (src - d) % size) for src in range(size)]
        received = jax.lax.ppermute(rows, axis, perm)
        parts.append(received * recv_b[j][:, None])
    return jnp.concatenate(parts, axis=0)


@dataclasses.dataclass
class OperatorSolverOperands:
    """Host-built operands for the sharded linear-OPERATOR multi-scale solver
    (the graph-parallel twin of
    ``ops.vertex_update.update_positions_multiscale_operator``): per scale,
    the DEDUPED vertex→level-s-face incidence with multiplicities (shrinking
    the per-iteration t-gather from 25 to the distinct-face count) and the
    static level-s-face→vertex center operator ``c_s = A_s·x``
    (``ops.vertex_update.face_center_klists``) replacing the per-iteration
    fine-corner gather + ``avg_ignore_zeros`` pool chain. Build with
    :func:`prepare_multiscale_solver_operator`."""

    num_vertices: int
    num_faces: int
    v_block: int
    f_block: int
    # per-scale deduped vertex→face_s tables ([D, vb, K_u] etc.) + mults
    vfu_locals: Tuple[jnp.ndarray, ...]
    vfu_sends: Tuple[jnp.ndarray, ...]
    vfu_recvs: Tuple[jnp.ndarray, ...]
    vfu_offsets: Tuple[Tuple[int, ...], ...]
    vfu_mults: Tuple[jnp.ndarray, ...]
    # per-scale face_s→vertex center-operator tables ([D, fb_s, K_s]) + wts
    fc_locals: Tuple[jnp.ndarray, ...]
    fc_sends: Tuple[jnp.ndarray, ...]
    fc_recvs: Tuple[jnp.ndarray, ...]
    fc_offsets: Tuple[Tuple[int, ...], ...]
    fc_weights: Tuple[jnp.ndarray, ...]
    lmbd: jnp.ndarray

    def device_operands(self):
        """The array pytree to pass through shard_map (specs: all P(axis))."""
        return (
            self.vfu_locals, self.vfu_sends, self.vfu_recvs, self.vfu_mults,
            self.fc_locals, self.fc_sends, self.fc_recvs, self.fc_weights,
            self.lmbd,
        )


def prepare_multiscale_solver_operator(
    face_normals_shapes,              # per-level face counts, fine→coarse
    faces: np.ndarray,
    v_faces: np.ndarray,
    num_vertices: int,
    num_shards: int,
    coarsening_steps: int = 2,
) -> OperatorSolverOperands:
    from facet_graph_convolution_tpu.graph.convert import dedupe_klist
    from facet_graph_convolution_tpu.ops.vertex_update import (
        face_center_klists,
    )

    levels = len(face_normals_shapes)
    group = 2 ** coarsening_steps
    f = faces.shape[0]
    f_align = num_shards * group ** (levels - 1)
    assert f % f_align == 0, (f, f_align, "pad faces before partitioning")
    assert num_vertices % num_shards == 0, (num_vertices, num_shards)
    fb = f // num_shards
    vb = num_vertices // num_shards

    counts = np.sum(v_faces >= 0, axis=1).astype(np.float32)
    lmbd = np.where(counts > 0, 1.0 / np.maximum(counts, 1.0), 0.0)[:, None]

    vfu_locals, vfu_sends, vfu_recvs, vfu_offs, vfu_mults = [], [], [], [], []
    for s in range(levels):
        divisor = group ** s
        vf1 = np.where(v_faces < 0, 0,
                       (v_faces.astype(np.int64) // divisor) + 1)
        vf_u, mult = dedupe_klist(vf1.astype(np.int32))
        idx_s = vf_u.astype(np.int64) - 1                 # 0 pad → −1
        part = partition_index_map(idx_s, num_shards,
                                   producer_count=f // divisor)
        vfu_locals.append(jnp.asarray(part.local_idx))
        vfu_sends.append(jnp.asarray(part.send_idx))
        vfu_recvs.append(jnp.asarray(part.recv_mask))
        vfu_offs.append(part.offsets)
        vfu_mults.append(jnp.asarray(
            mult.astype(np.float32).reshape(num_shards, vb, -1)))

    fc_locals, fc_sends, fc_recvs, fc_offs, fc_ws = [], [], [], [], []
    klists = face_center_klists(faces, face_normals_shapes, num_vertices,
                                coarsening_steps)
    for s, (adj, wt) in enumerate(klists):
        idx_s = adj.astype(np.int64) - 1                  # 0 pad → −1
        part = partition_index_map(idx_s, num_shards,
                                   producer_count=num_vertices)
        fc_locals.append(jnp.asarray(part.local_idx))
        fc_sends.append(jnp.asarray(part.send_idx))
        fc_recvs.append(jnp.asarray(part.recv_mask))
        fc_offs.append(part.offsets)
        fc_ws.append(jnp.asarray(wt.reshape(num_shards, adj.shape[0] // num_shards, -1)))

    return OperatorSolverOperands(
        num_vertices=num_vertices,
        num_faces=f,
        v_block=vb,
        f_block=fb,
        vfu_locals=tuple(vfu_locals),
        vfu_sends=tuple(vfu_sends),
        vfu_recvs=tuple(vfu_recvs),
        vfu_offsets=tuple(vfu_offs),
        vfu_mults=tuple(vfu_mults),
        fc_locals=tuple(fc_locals),
        fc_sends=tuple(fc_sends),
        fc_recvs=tuple(fc_recvs),
        fc_offsets=tuple(fc_offs),
        fc_weights=tuple(fc_ws),
        lmbd=jnp.asarray(lmbd.reshape(num_shards, vb, 1)),
    )


def multiscale_solver_local_operator(
    x_loc,                            # [vb, 3] owned vertex positions
    fn_blocks,                        # per-level [fb/4^s, 3] LIVE face normals
    ops_dev,                          # OperatorSolverOperands.device_operands,
                                      # each leaf indexed [0] by the caller
    vfu_offsets, fc_offsets,          # static offset tuples
    axis: str,
    coarsening_steps: int = 2,
    iter_nums=(80, 20, 20),
):
    """Differentiable sharded OPERATOR solver body (inside shard_map) — the
    graph-parallel twin of
    ``ops.vertex_update.update_positions_multiscale_operator``: the
    per-vertex slot normals and the [vb, 3, 3] projector are hoisted out of
    the loop; each iteration runs ONE vertex→face halo exchange (positions
    for the static A_s center operator — no fine-corner gather, no pool
    chain) and ONE face→vertex t-scalar exchange over the DEDUPED slots."""
    (vfu_ls, vfu_ss, vfu_rs, vfu_ms,
     fc_ls, fc_ss, fc_rs, fc_ws, lmb) = ops_dev
    levels = len(fn_blocks)
    dx_out = []
    for s in range(levels):
        cur = levels - 1 - s
        # loop-invariant: deduped per-vertex normals + hoisted projector
        fn_ext = _exchange_rows(fn_blocks[cur], vfu_ss[cur], vfu_rs[cur],
                                vfu_offsets[cur], axis)
        fn_ext_pad = jnp.concatenate(
            [jnp.zeros_like(fn_ext[:1]), fn_ext], axis=0
        )
        v_fn = jnp.take(fn_ext_pad, vfu_ls[cur], axis=0)    # [vb, K_u, 3]
        mult = vfu_ms[cur]                                  # [vb, K_u]
        p = jnp.einsum("vka,vkb,vk->vab", v_fn, v_fn, mult)  # [vb, 3, 3]

        def body(_, x_l, cur=cur, v_fn=v_fn, mult=mult, p=p,
                 fn_cur=fn_blocks[cur]):
            # c_s = A_s·x directly (static operator; fake faces have no
            # slots → exact zero, matching the corner+pool chain)
            x_ext = _exchange_rows(x_l, fc_ss[cur], fc_rs[cur],
                                   fc_offsets[cur], axis)
            ext_pad = jnp.concatenate([jnp.zeros_like(x_ext[:1]), x_ext],
                                      axis=0)
            g = jnp.take(ext_pad, fc_ls[cur], axis=0)       # [fb_s, K_s, 3]
            c = jnp.sum(fc_ws[cur][..., None] * g, axis=1)  # [fb_s, 3]
            t_loc = jnp.sum(fn_cur * c, axis=-1, keepdims=True)  # [fb_s, 1]
            t_ext = _exchange_rows(t_loc, vfu_ss[cur], vfu_rs[cur],
                                   vfu_offsets[cur], axis)
            t_pad = jnp.concatenate([jnp.zeros_like(t_ext[:1]), t_ext],
                                    axis=0)
            t_vk = jnp.take(t_pad, vfu_ls[cur], axis=0)[..., 0]  # [vb, K_u]
            term1 = jnp.sum((mult * t_vk)[..., None] * v_fn, axis=1)
            px = jnp.einsum("vab,vb->va", p, x_l)
            return x_l + lmb * (term1 - px)

        x_init = x_loc
        x_loc = jax.lax.fori_loop(0, int(iter_nums[s]), body, x_loc)
        dx_out.append(x_loc - x_init)
    return x_loc, tuple(dx_out)


def multiscale_solver_local(
    x_loc,                            # [vb, 3] owned vertex positions
    fn_blocks,                        # per-level [fb/4^s, 3] LIVE face normals
    ops_dev,                          # MultiscaleSolverOperands.device_operands,
                                      # each leaf indexed [0] by the caller
    offsets_fv, offsets_vf,           # static offset tuples
    axis: str,
    coarsening_steps: int = 2,
    iter_nums=(80, 20, 20),
):
    """Differentiable sharded multi-scale solver body (inside shard_map).

    Unlike the inference wrapper, the per-vertex face normals are gathered on
    DEVICE from the live (network-predicted) normals so gradients flow from
    the refined positions back into the heads (reference trainAccuracyNet,
    train.py:636-914)."""
    from facet_graph_convolution_tpu.ops.pooling import tree_pool

    (fv_l, fv_s, fv_r, vf_ls, vf_ss, vf_rs, lmb) = ops_dev
    levels = len(fn_blocks)
    dx_out = []
    for s in range(levels):
        cur = levels - 1 - s
        # per-vertex normals at this scale, gathered from live fn via halo
        fn_ext = _exchange_rows(fn_blocks[cur], vf_ss[cur], vf_rs[cur],
                                offsets_vf[cur], axis)
        fn_ext_pad = jnp.concatenate(
            [jnp.zeros_like(fn_ext[:1]), fn_ext], axis=0
        )
        v_fn = jnp.take(fn_ext_pad, vf_ls[cur], axis=0)     # [vb, K, 3]

        def body(_, x_l, cur=cur, v_fn=v_fn, fn_cur=fn_blocks[cur]):
            x_ext = _exchange_rows(x_l, fv_s, fv_r, offsets_fv, axis)
            ext_pad = jnp.concatenate([jnp.zeros_like(x_ext[:1]), x_ext], axis=0)
            corners = jnp.take(ext_pad, fv_l, axis=0)
            fpos = jnp.mean(corners, axis=1)
            if cur > 0:
                fpos = tree_pool(fpos, steps=coarsening_steps * cur,
                                 mode="avg_ignore_zeros")
            # ⟨n_f, c_f − x_v⟩ distributed as ⟨n_f, c_f⟩ − ⟨n_f, x_v⟩ (same
            # trick as the single-device solver): the per-face SCALAR
            # t_f = ⟨n_f, c_f⟩ is computed on the face shard and exchanged/
            # gathered instead of the [*, 3] face centers — 3× less halo
            # traffic and gather bytes per iteration
            t_loc = jnp.sum(fn_cur * fpos, axis=-1, keepdims=True)  # [fb_s, 1]
            t_ext = _exchange_rows(t_loc, vf_ss[cur], vf_rs[cur],
                                   offsets_vf[cur], axis)
            t_pad = jnp.concatenate([jnp.zeros_like(t_ext[:1]), t_ext], axis=0)
            t_vk = jnp.take(t_pad, vf_ls[cur], axis=0)[..., 0]      # [vb, K]
            n_w = t_vk - dot_last(v_fn, x_l[:, None, :])
            update = jnp.sum(n_w[..., None] * v_fn, axis=1)
            return x_l + lmb * update

        x_init = x_loc
        x_loc = jax.lax.fori_loop(0, int(iter_nums[s]), body, x_loc)
        dx_out.append(x_loc - x_init)
    return x_loc, tuple(dx_out)
