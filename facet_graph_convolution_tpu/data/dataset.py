"""Dataset containers: mesh → tree-ordered, padded facet-graph patches.

Re-design of the reference's pickle-of-lists dataset classes
(``PreprocessedData`` dataClasses.py:6-478, ``TrainingSet``
dataClasses.py:480-506, ``InferenceMesh`` dataClasses.py:509-531):

- the same pipeline semantics: per-mesh (or per-BFS-patch) K-list adjacency,
  normal-weighted Graclus coarsening with retry-while-saturated, binary-tree
  node ordering with zero-signalled fake nodes;
- but a flat :class:`FacetPatch` record serialized to ``.npz`` (instead of
  pickled Python objects), with optional bucket padding so XLA sees a small
  set of static shapes.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from facet_graph_convolution_tpu.config import Config, default_config
from facet_graph_convolution_tpu.geometry import (
    border_faces,
    compute_face_normals,
    edge_map,
    triangle_barycenters,
    vertex_faces,
)
from facet_graph_convolution_tpu.geometry.pointset import (
    bounding_box,
    normalize_point_sets,
    point_set_slice,
)
from facet_graph_convolution_tpu.graph import (
    coarsen_graph,
    coo_to_klist,
    face_adjacency_klist,
    grow_graph_patch_masked,
    grow_mesh_patch,
    invert_permutation,
    klist_to_coo_normal_weighted,
)


@dataclass
class FacetPatch:
    """One network input: a facet-graph patch in binary-tree order."""

    inputs: np.ndarray                       # [N, 6] normals ++ barycenters
    adjs: List[np.ndarray]                   # per-level K-lists [N/4^l, K]
    num_real: int                            # faces before fake padding
    gt_normals: Optional[np.ndarray] = None  # [N, 3]
    patch_indices: Optional[np.ndarray] = None   # global face ids [num_real]
    perm_inv: Optional[np.ndarray] = None    # tree-order → original order
    # vertex-pipeline extras (reference addMeshWithVertices)
    vertices: Optional[np.ndarray] = None    # [V, 3]
    gt_vertices: Optional[np.ndarray] = None
    faces: Optional[np.ndarray] = None       # [N, 3] tree-ordered, −1 padded
    v_faces: Optional[np.ndarray] = None     # [V, k_v]
    v_old_idx: Optional[np.ndarray] = None
    f_old_idx: Optional[np.ndarray] = None

    @property
    def num_nodes(self) -> int:
        return self.inputs.shape[0]


def _coarsen_with_retry(
    adj: np.ndarray,
    positions: np.ndarray,
    normals: np.ndarray,
    k: int,
    levels: int,
    steps: int,
    rng: np.random.Generator,
    max_retries: int = 20,
    reorder: Optional[str] = None,
) -> Tuple[List[np.ndarray], np.ndarray]:
    """Coarsen and convert back to K-lists, retrying the whole (randomized)
    coarsening whenever any level saturates K (reference
    dataClasses.py:114-131)."""
    coo = klist_to_coo_normal_weighted(adj, positions, normals)
    for _ in range(max_retries):
        sparse_adjs, new_to_old = coarsen_graph(
            coo, (levels - 1) * steps, rng=rng, reorder=reorder
        )
        klists = []
        saturated = False
        for lvl in range(levels):
            klist, sat = coo_to_klist(sparse_adjs[steps * lvl], k)
            klists.append(klist)
            saturated = saturated or sat
        if not saturated:
            return klists, np.asarray(new_to_old)
    raise RuntimeError("coarsening kept saturating K; increase k_faces")


def build_patch(
    features: np.ndarray,                    # [n, 6] normals ++ positions
    adj: np.ndarray,                         # [n, K] one-indexed
    gt_normals: Optional[np.ndarray],
    levels: int,
    steps: int,
    rng: np.random.Generator,
    patch_indices: Optional[np.ndarray] = None,
    faces: Optional[np.ndarray] = None,      # optional local faces to co-permute
    reorder: Optional[str] = None,
) -> FacetPatch:
    """Coarsen one patch and produce the tree-ordered padded record
    (reference dataClasses.py:109-158)."""
    k = adj.shape[1]
    n = features.shape[0]
    if levels > 1:
        adjs, new_to_old = _coarsen_with_retry(
            adj, features[:, -3:], features[:, :3], k, levels, steps, rng,
            reorder=reorder,
        )
        new_n = len(new_to_old)
        feat = np.zeros((new_n, features.shape[1]), features.dtype)
        feat[:n] = features
        feat = feat[new_to_old]
        gt = None
        if gt_normals is not None:
            gt = np.zeros((new_n, 3), gt_normals.dtype)
            gt[:n] = gt_normals
            gt = gt[new_to_old]
        perm_inv = invert_permutation(new_to_old)
        faces_out = None
        if faces is not None:
            faces_pad = np.full((new_n, 3), -1, dtype=np.int32)
            faces_pad[:n] = faces
            faces_out = faces_pad[new_to_old]
        return FacetPatch(
            inputs=feat.astype(np.float32),
            adjs=adjs,
            num_real=n,
            gt_normals=None if gt is None else gt.astype(np.float32),
            patch_indices=patch_indices,
            perm_inv=perm_inv,
            faces=faces_out,
        )
    return FacetPatch(
        inputs=features.astype(np.float32),
        adjs=[adj],
        num_real=n,
        gt_normals=None if gt_normals is None else gt_normals.astype(np.float32),
        patch_indices=patch_indices,
        perm_inv=None,
        faces=None if faces is None else np.asarray(faces, np.int32),
    )


class MeshDataset:
    """Base dataset: meshes split into coarsened facet patches (reference
    ``PreprocessedData``, dataClasses.py:6-478)."""

    def __init__(
        self,
        max_patch_size: int,
        coarsening_steps: int,
        coarsening_levels: int,
        k_faces: int = 23,
        min_patch_size: int = 2000,
        k_vertices: int = 25,
        max_edges: int = 20,
        seed: Optional[int] = None,
        reorder: Optional[str] = "rcm",
    ):
        self.patches: List[FacetPatch] = []
        self.max_patch_size = max_patch_size
        self.min_patch_size = min_patch_size
        self.coarsening_steps = coarsening_steps
        self.coarsening_levels = coarsening_levels
        self.k_faces = k_faces
        self.k_vertices = k_vertices
        self.max_edges = max_edges
        # locality-preserving coarse ordering (graph.coarsen.coarsen_graph
        # reorder="rcm"): contiguous tree-order index blocks become spatially
        # compact, which keeps halo partitions low-boundary on big meshes;
        # pass None for the reference's identity coarse order
        self.reorder = reorder
        self.rng = np.random.default_rng(seed)
        # whole-mesh data for inference reassembly
        self.edge_map: Optional[np.ndarray] = None
        self.v_e_map: Optional[np.ndarray] = None
        self.vertices: Optional[np.ndarray] = None
        self.faces: Optional[np.ndarray] = None
        self.normals: Optional[np.ndarray] = None
        self.num_vertices: int = 0
        self.num_faces: int = 0

    # -- normals-only pipeline (reference addMesh_TimeEfficient) ------------

    def add_mesh(
        self,
        vertices: np.ndarray,
        faces: np.ndarray,
        gt_vertices: Optional[np.ndarray] = None,
    ) -> None:
        """Add one mesh, splitting into masked BFS patches when larger than
        ``max_patch_size`` (reference dataClasses.py:34-234)."""
        self.edge_map, self.v_e_map = edge_map(faces, max_edges=self.max_edges)
        f_normals = compute_face_normals(vertices, faces)
        adj = face_adjacency_klist(faces, self.k_faces)
        f_pos = triangle_barycenters(vertices, faces)
        features = np.concatenate([f_normals, f_pos], axis=1)
        gt_normals = (
            compute_face_normals(gt_vertices, faces) if gt_vertices is not None else None
        )

        fnum = faces.shape[0]
        if fnum <= self.max_patch_size:
            self.patches.append(
                build_patch(
                    features, adj, gt_normals,
                    self.coarsening_levels, self.coarsening_steps, self.rng,
                    reorder=self.reorder,
                    patch_indices=np.arange(fnum),
                )
            )
            return

        covered = np.zeros(fnum, dtype=np.int8)
        next_seed = -1
        while np.any(covered == 0):
            to_process = np.flatnonzero(covered == 0)
            if next_seed == -1 or covered[next_seed] == 1:
                seed = int(self.rng.choice(to_process))
            else:
                seed = next_seed
            patch_adj, old_idx, next_seed = grow_graph_patch_masked(
                adj, self.max_patch_size, seed, covered, self.min_patch_size
            )
            covered[old_idx] = 1
            if old_idx.shape[0] < 100:      # skip tiny disjoint components
                continue
            self.patches.append(
                build_patch(
                    features[old_idx], patch_adj,
                    None if gt_normals is None else gt_normals[old_idx],
                    self.coarsening_levels, self.coarsening_steps, self.rng,
                    patch_indices=old_idx, reorder=self.reorder,
                )
            )

    # -- vertex pipeline (reference addMeshWithVertices) --------------------

    def add_mesh_with_vertices(
        self,
        vertices: np.ndarray,
        faces: np.ndarray,
        gt_vertices: Optional[np.ndarray] = None,
    ) -> None:
        """Vertex-pipeline variant (reference dataClasses.py:236-456):
        normalized vertices, GT as a point set sliced per patch bounding box,
        faces co-permuted into tree order with −1 fakes, per-vertex incident
        face lists."""
        self.num_vertices = vertices.shape[0]
        self.num_faces = faces.shape[0]
        f_normals = compute_face_normals(vertices, faces)
        adj = face_adjacency_klist(faces, self.k_faces)
        f_pos = triangle_barycenters(vertices, faces, normalize=True)
        features = np.concatenate([f_normals, f_pos], axis=1)
        gt_normals = (
            compute_face_normals(gt_vertices, faces) if gt_vertices is not None else None
        )
        if gt_vertices is not None:
            vertices, gt_vertices = normalize_point_sets(vertices, gt_vertices)
        else:
            vertices, _ = normalize_point_sets(vertices, vertices)

        fnum = faces.shape[0]
        if fnum <= self.max_patch_size:
            patch = build_patch(
                features, adj, gt_normals,
                self.coarsening_levels, self.coarsening_steps, self.rng,
                patch_indices=np.arange(fnum), faces=faces,
                reorder=self.reorder,
            )
            patch.vertices = np.asarray(vertices, np.float32)
            patch.gt_vertices = (
                None if gt_vertices is None else np.asarray(gt_vertices, np.float32)
            )
            patch.v_faces = vertex_faces(patch.faces, self.k_vertices, vertices.shape[0])
            patch.v_old_idx = np.arange(vertices.shape[0])
            patch.f_old_idx = np.arange(fnum)
            self.patches.append(patch)
            return

        covered = np.zeros(fnum, dtype=np.int8)
        while np.any(covered == 0):
            to_process = np.flatnonzero(covered == 0)
            seed = int(self.rng.choice(to_process))
            pv, pf, padj, v_old, f_old = grow_mesh_patch(
                vertices, faces, adj, self.max_patch_size, seed
            )
            covered[f_old] += 1
            if f_old.shape[0] < 100:
                continue
            patch_gt = None
            if gt_vertices is not None:
                patch_gt = point_set_slice(gt_vertices, bounding_box(pv))
                if patch_gt.shape[0] < pv.shape[0]:
                    continue    # no GT support in this window (dataClasses.py:302-304)
            patch = build_patch(
                features[f_old], padj,
                None if gt_normals is None else gt_normals[f_old],
                self.coarsening_levels, self.coarsening_steps, self.rng,
                patch_indices=f_old, faces=pf, reorder=self.reorder,
            )
            patch.vertices = np.asarray(pv, np.float32)
            patch.gt_vertices = None if patch_gt is None else np.asarray(patch_gt, np.float32)
            patch.v_faces = vertex_faces(patch.faces, self.k_vertices, pv.shape[0])
            patch.v_old_idx = v_old
            patch.f_old_idx = f_old
            self.patches.append(patch)

    def correct_gt_flipped_faces(self) -> None:
        """Zero out likely-flipped GT normals (reference
        ``correctGTFlippedFaces``, dataClasses.py:459-468)."""
        from facet_graph_convolution_tpu.geometry import filter_flipped_faces
        from facet_graph_convolution_tpu.geometry.mesh_math import normalize_rows

        for p in self.patches:
            if p.gt_normals is not None:
                p.gt_normals = filter_flipped_faces(
                    normalize_rows(p.gt_normals), p.adjs[0]
                )


class TrainingSet(MeshDataset):
    """min patch size = max patch size: no undersized training patches
    (reference dataClasses.py:480-487)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.min_patch_size = self.max_patch_size


class InferenceMesh(MeshDataset):
    """Single whole mesh kept alongside its patches for reassembly
    (reference dataClasses.py:509-531)."""

    def add_mesh(self, vertices, faces, gt_vertices=None):
        super().add_mesh(vertices, faces, gt_vertices)
        self._keep_whole(vertices, faces)

    def add_mesh_with_vertices(self, vertices, faces, gt_vertices=None):
        super().add_mesh_with_vertices(vertices, faces, gt_vertices)
        self._keep_whole(vertices, faces)

    def _keep_whole(self, vertices, faces):
        self.vertices = np.asarray(vertices, np.float32)
        self.faces = np.asarray(faces)
        self.normals = compute_face_normals(vertices, faces)
        self.num_vertices = vertices.shape[0]
        self.num_faces = faces.shape[0]


# ---------------------------------------------------------------------------
# Serialization (.npz replaces pickled class instances, preprocess.py:33-34)
# ---------------------------------------------------------------------------

_OPTIONAL_FIELDS = (
    "gt_normals", "patch_indices", "perm_inv", "vertices", "gt_vertices",
    "faces", "v_faces", "v_old_idx", "f_old_idx",
)


def save_dataset(ds: MeshDataset, path: str) -> None:
    arrays = {}
    meta = {
        "num_patches": len(ds.patches),
        "max_patch_size": ds.max_patch_size,
        "coarsening_steps": ds.coarsening_steps,
        "coarsening_levels": ds.coarsening_levels,
        "k_faces": ds.k_faces,
        "num_vertices": ds.num_vertices,
        "num_faces": ds.num_faces,
    }
    arrays["meta"] = np.array(
        [meta[k] for k in sorted(meta)], dtype=np.int64
    )
    arrays["meta_keys"] = np.array(sorted(meta))
    for name in ("edge_map", "v_e_map", "vertices", "faces", "normals"):
        value = getattr(ds, name)
        if value is not None:
            arrays[f"mesh_{name}"] = value
    for i, p in enumerate(ds.patches):
        arrays[f"p{i}_inputs"] = p.inputs
        arrays[f"p{i}_num_real"] = np.array(p.num_real)
        for lvl, a in enumerate(p.adjs):
            arrays[f"p{i}_adj{lvl}"] = a
        for f_name in _OPTIONAL_FIELDS:
            value = getattr(p, f_name)
            if value is not None:
                arrays[f"p{i}_{f_name}"] = value
    np.savez_compressed(path, **arrays)


def load_dataset(path: str) -> MeshDataset:
    data = np.load(path, allow_pickle=False)
    meta = dict(zip([str(k) for k in data["meta_keys"]], data["meta"]))
    ds = MeshDataset(
        max_patch_size=int(meta["max_patch_size"]),
        coarsening_steps=int(meta["coarsening_steps"]),
        coarsening_levels=int(meta["coarsening_levels"]),
        k_faces=int(meta["k_faces"]),
    )
    ds.num_vertices = int(meta["num_vertices"])
    ds.num_faces = int(meta["num_faces"])
    for name in ("edge_map", "v_e_map", "vertices", "faces", "normals"):
        key = f"mesh_{name}"
        if key in data:
            setattr(ds, name, data[key])
    for i in range(int(meta["num_patches"])):
        adjs = []
        lvl = 0
        while f"p{i}_adj{lvl}" in data:
            adjs.append(data[f"p{i}_adj{lvl}"])
            lvl += 1
        patch = FacetPatch(
            inputs=data[f"p{i}_inputs"],
            adjs=adjs,
            num_real=int(data[f"p{i}_num_real"]),
        )
        for f_name in _OPTIONAL_FIELDS:
            key = f"p{i}_{f_name}"
            if key in data:
                setattr(patch, f_name, data[key])
        ds.patches.append(patch)
    return ds


# ---------------------------------------------------------------------------
# Bucket padding: XLA recompiles per shape; pad patches up to a small set of
# bucket sizes (multiples of 4^(levels-1) to stay tree-aligned).
# ---------------------------------------------------------------------------

def pad_patch_to(patch: FacetPatch, target: int) -> FacetPatch:
    """Pad a patch's fine level to ``target`` nodes with self-only fake nodes
    (zero signal, zero GT → masked by the fake-node discipline everywhere).
    Coarser levels pad proportionally."""
    n = patch.num_nodes
    if n == target:
        return patch
    if target < n:
        raise ValueError(f"cannot shrink patch {n} → {target}")
    group = n // patch.adjs[1].shape[0] if len(patch.adjs) > 1 else 1
    inputs = np.zeros((target, patch.inputs.shape[1]), patch.inputs.dtype)
    inputs[:n] = patch.inputs
    gt = None
    if patch.gt_normals is not None:
        gt = np.zeros((target, 3), patch.gt_normals.dtype)
        gt[:n] = patch.gt_normals
    adjs = []
    size = target
    for a in patch.adjs:
        k = a.shape[1]
        pad = np.zeros((size, k), a.dtype)
        pad[: a.shape[0]] = a
        pad[a.shape[0]:, 0] = np.arange(a.shape[0], size) + 1
        adjs.append(pad)
        size //= group if group > 1 else 1
        if group == 1:
            break
    faces = None
    if patch.faces is not None:
        faces = np.full((target, 3), -1, dtype=patch.faces.dtype)
        faces[:n] = patch.faces
    return dataclasses.replace(
        patch, inputs=inputs, gt_normals=gt, adjs=adjs, faces=faces
    )


def bucket_size(n: int, align: int = 1024) -> int:
    """Smallest multiple of ``align`` ≥ n (align must be a multiple of the
    tree group so all pyramid levels stay integral)."""
    return ((n + align - 1) // align) * align
