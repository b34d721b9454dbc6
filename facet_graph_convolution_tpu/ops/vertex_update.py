"""Differentiable vertex-position solvers.

The network predicts facet normals; vertices are then moved so faces agree
with those normals. Two solvers, both expressed as ``lax.fori_loop`` with
rematerialization instead of the reference's 60-120 *unrolled* TF iterations:

- :func:`update_positions_edges` — Taubin linear anisotropic filtering over
  the edge map (reference ``update_position2``, train.py:1467-1557);
- :func:`update_positions_multiscale` — coarse→fine projection solver over
  the v_faces incidence and the coarsening pyramid (reference
  ``update_position_MS``, train.py:1668-1765), with face centers recomputed
  from the moving vertices every iteration
  (``updateFacesCenter``, train.py:1768-1798).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from facet_graph_convolution_tpu.ops.normalization import dot_last
from facet_graph_convolution_tpu.ops.pooling import tree_pool


def update_positions_edges(
    x: jnp.ndarray,
    face_normals: jnp.ndarray,
    edge_map: jnp.ndarray,
    v_edges: jnp.ndarray,
    iter_num: int = 60,
    lmbd=1.0 / 18.0,
    checkpoint: bool = True,
    adaptive_tol: float = 0.0,
    trust: float = 0.0,
) -> jnp.ndarray:
    """Taubin linear anisotropic vertex filtering.

    For each vertex i:
      ``x_i += λ · Σ_{e ∋ i} Σ_{f ∋ e} n_f ⟨n_f, (x_{v1} − x_i) + (x_{v2} − x_i)⟩``

    ``edge_map`` [E, 4] rows are (v1, v2, f1, f2) with f2 = −1 on borders;
    ``v_edges`` [V, max_edges] lists edge ids per vertex, −1 padded. Padding
    rides zero rows exactly as in the reference (train.py:1479-1510): a pad
    edge resolves to the zero edge-map line whose faces hit the prepended
    zero normal, so its dot products vanish.

    The reference materializes all four (edge-endpoint × face) combinations
    (train.py:1510,1534-1536); since
    ``Σ_{a,b} n_b⟨n_b, e_a⟩ = Σ_b n_b⟨n_b, e_1+e_2⟩`` we fold the endpoint
    sum first — identical math, half the FLOPs.

    ``adaptive_tol > 0`` replaces the reference's FIXED 60-iteration
    schedule (train.py:130) with a residual-plateau stop under the same
    ``iter_num`` budget: iterate while the constraint residual
    ``r = Σ ⟨n_f, e₁+e₂⟩²`` still improves by more than ``adaptive_tol``
    per iteration (relative to its current level). The predicted normals
    are never perfectly consistent, so r converges to a positive floor;
    on a nearly-clean input r starts AT that floor and the loop exits
    after a few iterations instead of drifting the vertices tangentially
    for 60 (the round-4 caveat: refined WORSE than noisy in Hausdorff at
    noise 0.1 on CAD shapes), while a noisy input keeps the productive
    part of the schedule. Inference-only (``lax.while_loop`` is not
    reverse-mode differentiable — a grad through this branch fails inside
    JAX; ``checkpoint`` is ignored here since there is no backward to
    rematerialize for); the training paths keep the fixed schedule the
    loss was trained through.

    ``lmbd="degree"`` replaces the reference's global 1/18 step with the
    per-vertex ``1/(3·deg_v)`` it implicitly assumes (1/18 IS 1/(3·6),
    the regular-valence case): on meshes with high-valence vertices
    (e.g. a triangle-fan plate center with 64 incident edges) the global
    step exceeds the Jacobi stability bound and the iteration DIVERGES —
    measured residual growth of 1e6-1e13× over the reference's own 60
    iterations on cylinder-on-plate meshes, masked in mean metrics only
    because 60 iterations end before the oscillating mode blows up.

    ``trust > 0`` caps each vertex's TOTAL displacement from its input
    position at ``trust · r0_v``, where ``r0_v`` is the vertex's initial
    RMS constraint violation (a length — it estimates the local noise
    amplitude, so the cap auto-scales with noise level). This is the
    defense against BIASED predicted normals: at creases the net's
    normals are slightly rounded, the residual keeps decreasing toward
    the rounded surface (so no plateau stop fires), and the solver drags
    near-clean crease vertices off the true surface — measured on real
    trained-net normals: chamfered box @ noise 0.1 refines to Hausdorff
    0.00503 vs noisy 0.00425 WITHOUT the cap (the reference's fixed
    schedule has the same failure), 0.00381 with ``trust=0.75``, while
    high-noise rows keep their full gains (BASELINE.md round 5).
    """
    # one-index edges; prepend zero line so pad slots (-1 → 0) are inert
    v_edges1 = v_edges.astype(jnp.int32) + 1
    if isinstance(lmbd, str):
        if lmbd != "degree":
            raise ValueError(f"unknown lmbd mode {lmbd!r}")
        deg = jnp.sum((v_edges >= 0).astype(x.dtype), axis=-1)
        lmbd = jnp.where(deg > 0, 1.0 / (3.0 * jnp.maximum(deg, 1.0)),
                         0.0)[:, None]
    emap = edge_map.astype(jnp.int32) + jnp.array([[0, 0, 1, 1]], jnp.int32)
    emap = jnp.concatenate([jnp.zeros((1, 4), jnp.int32), emap], axis=0)
    fn_pad = jnp.concatenate([jnp.zeros((1, 3), face_normals.dtype), face_normals], axis=0)

    n_edges = jnp.take(emap, v_edges1, axis=0)          # [V, maxE, 4]
    v_pair_idx = n_edges[..., 0:2]                      # [V, maxE, 2] vertex ids
    f_idx = n_edges[..., 2:4]                           # [V, maxE, 2] one-indexed
    n_f = jnp.take(fn_pad, f_idx, axis=0)               # [V, maxE, 2, 3]

    def _proj(x):
        xv = jnp.take(x, v_pair_idx, axis=0)            # [V, maxE, 2, 3]
        e_vec = xv - x[:, None, None, :]
        s = jnp.sum(e_vec, axis=2)                      # [V, maxE, 3]
        return dot_last(n_f, s[:, :, None, :])          # [V, maxE, 2]

    x0 = x
    if trust > 0.0:
        # per-vertex displacement cap = trust × initial RMS violation
        p0 = _proj(x)
        cnt = jnp.maximum(
            2.0 * jnp.sum((v_edges >= 0).astype(x.dtype), axis=-1), 1.0)
        cap = trust * jnp.sqrt(jnp.sum(jnp.square(p0), axis=(1, 2)) / cnt)

    def step(x):
        proj = _proj(x)
        update = jnp.sum(n_f * proj[..., None], axis=(1, 2))
        x_new = x + lmbd * update
        if trust > 0.0:
            d = x_new - x0
            dn = jnp.linalg.norm(d, axis=1, keepdims=True)
            x_new = x0 + d * jnp.minimum(
                1.0, cap[:, None] / jnp.maximum(dn, 1e-12))
        return x_new, jnp.sum(jnp.square(proj))

    if adaptive_tol > 0.0:
        big = jnp.asarray(1e30, x.dtype)

        def cond(carry):
            _, r_pp, r_p, i = carry
            return jnp.logical_and(
                i < iter_num, (r_pp - r_p) > adaptive_tol * r_p)

        def w_body(carry):
            x, _, r_p, i = carry
            x_new, r = step(x)
            return x_new, r_p, r, i + 1

        x, _, _, _ = jax.lax.while_loop(
            cond, w_body, (x, big, big * 0.09, jnp.asarray(0, jnp.int32)))
        return x

    def body(_, x):
        return step(x)[0]

    if checkpoint:
        # prevent_cse=False: the body runs under fori_loop (a while/scan
        # lowering), where cross-iteration CSE cannot occur, so the
        # barrier machinery is pure overhead — and the default barriers
        # trigger a deterministic XLA miscompile (NaN grads from finite
        # inputs) in the remat + custom-vjp-gather + 120-iteration
        # composition at >20k-face scale (CPU and TPU backends alike;
        # BASELINE.md round 4, tools/repro_vertex_nan.py)
        body = jax.checkpoint(body, prevent_cse=False)
    return jax.lax.fori_loop(0, iter_num, body, x)


def update_positions_depth(
    x: jnp.ndarray,
    face_normals: jnp.ndarray,
    edge_map: jnp.ndarray,
    v_edges: jnp.ndarray,
    depth_dir: jnp.ndarray,
    iter_num: int = 20,
    lmbd: float = 1.0 / 18.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Depth-constrained variant: per-vertex displacement projected on a fixed
    direction before accumulation (reference ``update_position_with_depth``,
    train.py:1561-1665). Returns (x, displacement)."""
    v_edges1 = v_edges.astype(jnp.int32) + 1
    emap = edge_map.astype(jnp.int32) + jnp.array([[0, 0, 1, 1]], jnp.int32)
    emap = jnp.concatenate([jnp.zeros((1, 4), jnp.int32), emap], axis=0)
    fn_pad = jnp.concatenate([jnp.zeros((1, 3), face_normals.dtype), face_normals], axis=0)
    n_edges = jnp.take(emap, v_edges1, axis=0)
    v_pair_idx = n_edges[..., 0:2]
    f_idx = n_edges[..., 2:4]
    n_f = jnp.take(fn_pad, f_idx, axis=0)
    d = depth_dir.reshape(1, 1, 1, 3)

    def body(_, x):
        xv = jnp.take(x, v_pair_idx, axis=0)
        e_vec = xv - x[:, None, None, :]
        s = jnp.sum(e_vec, axis=2)
        proj = dot_last(n_f, s[:, :, None, :])          # [V, maxE, 2]
        contrib = n_f * proj[..., None]                 # [V, maxE, 2, 3]
        along = dot_last(contrib, d)[..., None] * d     # project on depth_dir
        update = jnp.sum(along, axis=(1, 2))
        return x + lmbd * update

    x_out = jax.lax.fori_loop(0, iter_num, body, x)
    return x_out, x_out - x


def face_centers_pyramid(
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    coarsening_steps: int,
    levels: int = 3,
) -> List[jnp.ndarray]:
    """Face centroids at every pyramid level from the current vertices
    (reference ``updateFacesCenter``, train.py:1768-1798).

    Fake faces (vertex ids −1) gather the prepended zero vertex so their
    centroid is exactly 0; coarser levels use zero-ignoring mean pooling.
    """
    faces1 = faces.astype(jnp.int32) + 1
    v_pad = jnp.concatenate([jnp.zeros((1, 3), vertices.dtype), vertices], axis=0)
    centers = jnp.mean(jnp.take(v_pad, faces1, axis=0), axis=1)   # [F, 3]
    out = [centers]
    for _ in range(levels - 1):
        out.append(tree_pool(out[-1], steps=coarsening_steps, mode="avg_ignore_zeros"))
    return out


def update_positions_multiscale(
    x: jnp.ndarray,
    face_normals_list: Sequence[jnp.ndarray],
    faces: jnp.ndarray,
    v_faces: jnp.ndarray,
    coarsening_steps: int = 2,
    iter_nums: Sequence[int] = (80, 20, 20),
    checkpoint: bool = True,
    unroll: int = 1,
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Coarse→fine vertex projection solver (reference ``update_position_MS``,
    train.py:1668-1765).

    ``face_normals_list`` holds per-level predicted normals fine→coarse;
    scales run coarsest first with ``iter_nums`` iterations each. A vertex's
    incident fine faces map to level-s nodes by integer division with
    ``(2^steps)^s`` — floor semantics keep the −1 padding inert
    (train.py:1706-1708). Per-vertex step size is ``1/|v_faces|``. Face
    centers are recomputed from the moving vertices each iteration. Returns
    final x and per-scale displacements (coarse first).
    """
    levels = len(face_normals_list)
    k = v_faces.shape[1]
    real = v_faces >= 0
    num_f = jnp.sum(real.astype(x.dtype), axis=-1)
    lmbd = jnp.where(num_f > 0, 1.0 / jnp.maximum(num_f, 1.0), 0.0)[:, None]

    dx_list: List[jnp.ndarray] = []
    for s in range(levels):
        cur_scale = levels - 1 - s
        fn = face_normals_list[cur_scale].reshape(-1, 3)
        fn_pad = jnp.concatenate([jnp.zeros((1, 3), fn.dtype), fn], axis=0)
        # floor division: −1 pads stay −1 → index 0 → zero normal row
        vf = (v_faces // (2 ** coarsening_steps) ** cur_scale) + 1
        v_fn = jnp.take(fn_pad, vf, axis=0)             # [V, K, 3] loop-inv.
        x_init = x

        def body(_, x, vf=vf, v_fn=v_fn, fn_pad=fn_pad, cur_scale=cur_scale):
            # ⟨n_f, c_f − x_v⟩ distributed as ⟨n_f, c_f⟩ − ⟨n_f, x_v⟩ (equal
            # up to fp reassociation): the per-face scalar t_f = ⟨n_f, c_f⟩
            # is computed once per face and gathered as a SCALAR per (v, k)
            # slot — 3× less gather traffic than gathering the [V, K, 3]
            # face-center tensor, and the e = v_c − x intermediate vanishes.
            # The v_fn-weighted reduction keeps the original slot order.
            fpos = face_centers_pyramid(x, faces, coarsening_steps, levels)[cur_scale]
            t = jnp.sum(fn_pad[1:] * fpos, axis=-1)     # [F_s]
            t_pad = jnp.concatenate([jnp.zeros((1,), t.dtype), t])
            t_vk = jnp.take(t_pad, vf, axis=0)          # [V, K] (pad → 0)
            n_w = t_vk - dot_last(v_fn, x[:, None, :])  # [V, K]
            update = jnp.sum(n_w[..., None] * v_fn, axis=1)
            return x + lmbd * update

        if checkpoint:
            # prevent_cse=False: see update_positions (same rationale and
            # the same miscompile trigger, BASELINE.md round 4)
            body = jax.checkpoint(body, prevent_cse=False)
        if unroll == 1:
            # NOTE: do not pass unroll=1 — an explicit unroll switches
            # fori_loop's lowering from while_loop to scan, whose remat
            # transposition explodes compile time on the 120-iteration solver
            x = jax.lax.fori_loop(0, int(iter_nums[s]), body, x)
        else:
            x = jax.lax.fori_loop(0, int(iter_nums[s]), body, x,
                                  unroll=unroll)
        dx_list.append(x - x_init)
    return x, dx_list


def _face_center_tables(faces, num_faces_per_level, num_vertices,
                        coarsening_steps):
    """Per-scale level-s-face → vertex incidence tables computing the
    face-center dot products directly from the moving vertices:
    ``c_s = A_s · x`` — the static linear operator equal to
    :func:`face_centers_pyramid`'s gather + iterated
    ``avg_ignore_zeros`` pool chain.

    The pool is ITERATED PAIRWISE (ops.pooling): at each of the
    ``levels·steps`` stages an all-zero sibling (a fake subtree — its
    centroid is exactly the zero row) is replaced by its partner before the
    /2 mean. The equivalent static weight of fine face f0 inside its scale-s
    ancestor is therefore ``Π over stages (1/2 if the sibling subtree has a
    real face else 1)``, 0 for fake faces — a structural restatement of the
    value test (a REAL face whose centroid lands on exact float zero would
    differ, a measure-zero event the moving-vertex iteration makes
    transient anyway). Each fine face then spreads its weight as w/3 onto
    its ≤3 valid vertices (−1 pads contribute the zero row in the
    reference, i.e. nothing), and duplicate (coarse face, vertex) pairs
    merge by summing — at scale 2 the 48 raw slots dedupe to ~20.

    Returns per-scale ``(fadjT [K_s, F_s], fadjT_t [S, V], fwT [K_s, F_s])``
    (one-indexed lane tables over the vertex axis + weights).
    """
    import numpy as np

    from facet_graph_convolution_tpu.graph.convert import lane_tables

    per_scale = []
    for adj, wt in face_center_klists(faces, num_faces_per_level,
                                      num_vertices, coarsening_steps):
        fadjT, fadjT_t = lane_tables(adj, num_sources=int(num_vertices))
        per_scale.append((
            jnp.asarray(fadjT),
            jnp.asarray(fadjT_t),
            jnp.asarray(np.ascontiguousarray(wt.T)),
        ))
    return per_scale


def face_center_klists(faces, num_faces_per_level, num_vertices,
                       coarsening_steps):
    """Raw per-scale level-s-face → vertex K-lists for ``c_s = A_s·x``
    (see :func:`_face_center_tables` for the weight derivation). Returns
    per-scale ``(adj [F_s, K_s] one-indexed vertex ids, 0 = pad,
    wt [F_s, K_s] float32)`` — consumed directly by the sharded solver's
    partitioner as well as the single-chip lane-table wrapper."""
    import numpy as np
    import scipy.sparse as sp

    faces = np.asarray(faces)
    f0 = faces.shape[0]
    nz = faces[:, 0] >= 0                    # fake faces are all −1
    w = nz.astype(np.float64)
    out = []
    sub = 1                                  # fine faces per current node
    for s, f_s in enumerate(num_faces_per_level):
        if s > 0:
            for _ in range(coarsening_steps):
                nzp = nz.reshape(-1, 2)
                both = nzp[:, 0] & nzp[:, 1]
                w = w * np.repeat(np.where(both, 0.5, 1.0), 2 * sub)
                nz = nzp[:, 0] | nzp[:, 1]
                sub *= 2
        group = sub                          # = (2^steps)^s
        cf = np.repeat(np.arange(f0, dtype=np.int64) // group, 3)
        vid = faces.ravel().astype(np.int64)
        wgt = np.repeat(w / 3.0, 3)
        keep = (vid >= 0) & (wgt > 0)
        mat = sp.coo_matrix(
            (wgt[keep], (cf[keep], vid[keep])),
            shape=(int(f_s), int(num_vertices)),
        ).tocsr()
        mat.sum_duplicates()
        counts = np.diff(mat.indptr)
        k_s = max(int(counts.max()) if counts.size else 0, 1)
        adj = np.zeros((int(f_s), k_s), np.int32)
        wt = np.zeros((int(f_s), k_s), np.float32)
        rows = np.repeat(np.arange(int(f_s)), counts)
        cols = np.concatenate([np.arange(c) for c in counts]) if counts.size \
            else np.zeros((0,), np.int64)
        adj[rows, cols] = mat.indices + 1    # one-indexed
        wt[rows, cols] = mat.data
        out.append((adj, wt))
    return out


def build_solver_tables(
    v_faces,
    num_faces_per_level: Sequence[int],
    num_vertices: int,
    coarsening_steps: int = 2,
    faces=None,
):
    """Host-side static tables for :func:`update_positions_multiscale_operator`.

    Per scale s: the vertex→level-s-face incidence DEDUPED (each of a
    vertex's 25 fine-face slots maps to a level-s node by integer division;
    at the coarsest scale the 25 slots collapse to ~2-4 distinct nodes) plus
    lane gather tables for scatter-free backwards. When ``faces`` is given,
    each per-scale tuple additionally carries the face→vertex incidence
    tables of :func:`_face_center_tables`, letting the solver compute the
    per-face center dot products as a single static gather ``A_s·x`` instead
    of rebuilding the whole center pyramid (gather + pad + pool chain) every
    iteration — the ~16 ms/58 ms block of the round-4 vertex profile.
    Everything here is a pure function of the (static) mesh structure —
    built once per patch, then threaded through the jitted step as
    arguments.

    Returns a tuple pytree of jnp arrays: ``per_scale[s] =
    (adjT [K_u, V], adjT_t [S, F_s], multT [K_u, V][, fadjT, fadjT_t,
    fwT])``.
    """
    import numpy as np

    from facet_graph_convolution_tpu.graph.convert import (
        dedupe_klist,
        lane_tables,
    )

    v_faces = np.asarray(v_faces)
    per_scale = []
    group = 2 ** coarsening_steps
    fc = (_face_center_tables(faces, num_faces_per_level, num_vertices,
                              coarsening_steps)
          if faces is not None else None)
    for s, f_s in enumerate(num_faces_per_level):
        # floor division keeps −1 pads negative → 0 after the +1 one-index
        vf1 = np.where(v_faces < 0, 0, (v_faces // group ** s) + 1)
        vf_u, mult = dedupe_klist(vf1.astype(np.int32))
        adjT, adjT_t = lane_tables(vf_u, num_sources=int(f_s))
        per_scale.append((
            jnp.asarray(adjT),
            jnp.asarray(adjT_t),
            jnp.asarray(np.ascontiguousarray(mult.T)),
        ) + (fc[s] if fc is not None else ()))
    return tuple(per_scale)


def update_positions_multiscale_operator(
    x: jnp.ndarray,
    face_normals_list: Sequence[jnp.ndarray],
    faces: jnp.ndarray,
    v_faces: jnp.ndarray,
    tables,
    coarsening_steps: int = 2,
    iter_nums: Sequence[int] = (80, 20, 20),
    checkpoint: bool = True,
    unroll: int = 1,
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Linear-operator formulation of the multi-scale solver — same math as
    :func:`update_positions_multiscale` (up to fp reassociation), rebuilt
    around the observation that each iteration is LINEAR in x for fixed
    normals:

        update_v = Σ_k n_vk (t[vf_vk] − n_vk·x_v)
                 = Σ_u mult_vu·t[vf_u]·n_vu  −  P_v x_v,
        P_v = Σ_u mult_vu n_vu n_vuᵀ   (loop-invariant, hoisted)

    with the per-slot structure DEDUPED per scale (``tables`` from
    :func:`build_solver_tables`): duplicate (vertex, face) slots carry
    identical terms, so the per-iteration t-gather shrinks from V·25 scalar
    rows to the distinct-face count (~13 fine, ~3 coarse), and both gather
    directions ride the scatter-free lane machinery
    (ops.gather.gather_neighbors_lane) instead of the fwd-scalar-gather +
    bwd-scalar-scatter pair that dominates the naive body's profile
    (112.8 + 66.8 of 232.9 ms/step measured on v5e — BASELINE.md round 4).

    The reference's per-vertex step size 1/|v_faces| and zero-padding
    semantics are preserved exactly (train.py:1706-1760)."""
    from facet_graph_convolution_tpu.ops.gather import gather_neighbors_lane

    levels = len(face_normals_list)
    real = v_faces >= 0
    num_f = jnp.sum(real.astype(x.dtype), axis=-1)
    lmbd = jnp.where(num_f > 0, 1.0 / jnp.maximum(num_f, 1.0), 0.0)[None, :]

    x_t = x.T                                            # [3, V] node-minor
    dx_list: List[jnp.ndarray] = []
    for s in range(levels):
        cur_scale = levels - 1 - s
        tab = tables[cur_scale]
        adjT, adjT_t, multT = tab[:3]
        fc_tab = tab[3:6] if len(tab) >= 6 else None
        fn = face_normals_list[cur_scale].reshape(-1, 3)
        fn_t = fn.T                                      # [3, F_s]
        # loop-invariant: per-slot normals (zero column for pad slots) and
        # the per-vertex projector P (n nᵀ summed with multiplicities)
        n_vu = gather_neighbors_lane(fn_t, adjT, adjT_t)     # [3, K_u, V]
        p_t = jnp.einsum("akv,bkv,kv->abv", n_vu, n_vu, multT)   # [3, 3, V]
        if fc_tab is not None:
            # fold the normals into the center operator ONCE: t = Σ_a
            # fn[a,f] · Σ_k w[k,f] x[a, idx[k,f]] = Σ_k (w·fn[a])ᵀ-weighted
            # gather — the per-slot weight nw = w[k,f]·fn[a,f] is
            # loop-invariant, so each iteration is one lane gather + one
            # weighted reduce (no pad concat, no [F,3,3] gather, no pool
            # chain — those were the largest block of the round-4 profile)
            fadjT, fadjT_t, fwT = fc_tab
            nw = fwT[None] * fn_t[:, None, :]            # [3, K_s, F_s]
        else:
            nw = None
        x_init_t = x_t

        def body(_, x_t, adjT=adjT, adjT_t=adjT_t, multT=multT,
                 n_vu=n_vu, p_t=p_t, fn=fn, cur_scale=cur_scale,
                 fc_tab=fc_tab, nw=nw):
            if fc_tab is not None:
                fadjT_, fadjT_t_, _ = fc_tab
                g = gather_neighbors_lane(x_t, fadjT_, fadjT_t_)  # [3,K_s,F_s]
                t = jnp.sum(nw * g, axis=(0, 1))         # [F_s]
            else:
                fpos = face_centers_pyramid(
                    x_t.T, faces, coarsening_steps, levels)[cur_scale]
                t = jnp.sum(fn * fpos, axis=-1)          # [F_s]
            t_vu = gather_neighbors_lane(t[None], adjT, adjT_t)[0]  # [K_u, V]
            term1 = jnp.sum((multT * t_vu)[None] * n_vu, axis=1)    # [3, V]
            px = jnp.einsum("abv,bv->av", p_t, x_t)
            return x_t + lmbd * (term1 - px)

        if checkpoint:
            # prevent_cse=False: see update_positions (same rationale and
            # the same miscompile trigger, BASELINE.md round 4)
            body = jax.checkpoint(body, prevent_cse=False)
        if unroll == 1:
            # see update_positions_multiscale: explicit unroll forces the
            # scan lowering, whose remat transposition compiles pathologically
            x_t = jax.lax.fori_loop(0, int(iter_nums[s]), body, x_t)
        else:
            x_t = jax.lax.fori_loop(0, int(iter_nums[s]), body, x_t,
                                    unroll=unroll)
        dx_list.append((x_t - x_init_t).T)
    return x_t.T, dx_list
