"""Synthetic mesh generation for tests, examples, and benchmarks.

The reference trains on the Wang et al. synthetic set (clean CAD-like meshes
plus Gaussian vertex noise at σ ∈ {0.1, 0.2, 0.3}·avg-edge-length, named
``*_n1/_n2/_n3``; README.md:61-72). This module generates comparable shapes —
smooth (sphere, torus), sharp-edged (box, fandisk-like prisms) — and applies
the same noise convention.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from facet_graph_convolution_tpu.geometry.mesh_math import average_edge_length


def icosphere(subdiv: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int64,
    )
    for _ in range(subdiv):
        verts, faces = subdivide_mesh(verts, faces, project_unit=True)
    return verts.astype(np.float32), faces.astype(np.int32)


def subdivide_mesh(
    verts: np.ndarray, faces: np.ndarray, project_unit: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """One 4:1 midpoint (Loop-topology) subdivision step, fully vectorized —
    no per-face Python loop, so multi-million-facet meshes build in seconds.
    Each edge gets one midpoint vertex (deduped across faces); with
    ``project_unit`` midpoints are renormalized onto the unit sphere
    (icosphere refinement)."""
    verts = np.asarray(verts, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)
    nv = verts.shape[0]
    nf = faces.shape[0]
    # the three edges of every face, canonical (lo, hi) keying for dedup
    e = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    )
    lo = e.min(axis=1)
    hi = e.max(axis=1)
    key = lo * nv + hi
    uniq, inv = np.unique(key, return_inverse=True)
    mid = (verts[uniq // nv] + verts[uniq % nv]) * 0.5
    if project_unit:
        mid /= np.linalg.norm(mid, axis=1, keepdims=True)
    ab = inv[:nf] + nv
    bc = inv[nf : 2 * nf] + nv
    ca = inv[2 * nf :] + nv
    a, b, c = faces[:, 0], faces[:, 1], faces[:, 2]
    new_faces = np.concatenate(
        [
            np.stack([a, ab, ca], axis=1),
            np.stack([b, bc, ab], axis=1),
            np.stack([c, ca, bc], axis=1),
            np.stack([ab, bc, ca], axis=1),
        ],
        axis=0,
    )
    return np.concatenate([verts, mid], axis=0), new_faces.astype(np.int64)


def torus(
    major: float = 1.0, minor: float = 0.4, nu: int = 48, nv: int = 24
) -> Tuple[np.ndarray, np.ndarray]:
    u = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    v = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    x = (major + minor * np.cos(vv)) * np.cos(uu)
    y = (major + minor * np.cos(vv)) * np.sin(uu)
    z = minor * np.sin(vv)
    verts = np.stack([x, y, z], axis=-1).reshape(-1, 3).astype(np.float32)

    faces = []
    for i in range(nu):
        for j in range(nv):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces += [[a, b, c], [a, c, d]]
    return verts, np.asarray(faces, dtype=np.int32)


def box(
    nx: int = 8, ny: int = 8, nz: int = 8, size=(1.0, 1.0, 1.0)
) -> Tuple[np.ndarray, np.ndarray]:
    """Axis-aligned box with an (nx, ny, nz)-subdivided surface grid — sharp
    edges exercise the feature-preserving behavior of the denoiser."""
    sx, sy, sz = size
    verts = []
    vid = {}

    def vert(x, y, z):
        key = (round(x, 9), round(y, 9), round(z, 9))
        if key not in vid:
            vid[key] = len(verts)
            verts.append([x, y, z])
        return vid[key]

    faces = []

    def grid_face(origin, du, dv, nu_, nv_):
        for i in range(nu_):
            for j in range(nv_):
                p00 = np.asarray(origin) + du * (i / nu_) + dv * (j / nv_)
                p10 = np.asarray(origin) + du * ((i + 1) / nu_) + dv * (j / nv_)
                p11 = np.asarray(origin) + du * ((i + 1) / nu_) + dv * ((j + 1) / nv_)
                p01 = np.asarray(origin) + du * (i / nu_) + dv * ((j + 1) / nv_)
                a, b, c, d = (vert(*p00), vert(*p10), vert(*p11), vert(*p01))
                faces.extend([[a, b, c], [a, c, d]])

    ex, ey, ez = np.array([sx, 0, 0]), np.array([0, sy, 0]), np.array([0, 0, sz])
    grid_face([0, 0, 0], ey, ex, ny, nx)          # bottom (z=0), outward −z
    grid_face([0, 0, sz], ex, ey, nx, ny)         # top
    grid_face([0, 0, 0], ex, ez, nx, nz)          # y=0
    grid_face([0, sy, 0], ez, ex, nz, nx)         # y=sy
    grid_face([0, 0, 0], ez, ey, nz, ny)          # x=0
    grid_face([sx, 0, 0], ey, ez, ny, nz)         # x=sx
    return np.asarray(verts, dtype=np.float32), np.asarray(faces, dtype=np.int32)


def add_vertex_noise(
    vertices: np.ndarray,
    faces: np.ndarray,
    level: float = 0.2,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Gaussian vertex noise with σ = level · average-edge-length (the Wang
    et al. convention the reference dataset uses; n1/n2/n3 ≈ 0.1/0.2/0.3)."""
    rng = rng or np.random.default_rng()
    el, _ = average_edge_length(vertices, faces)
    noise = rng.normal(scale=level * el, size=vertices.shape)
    return (vertices + noise).astype(np.float32)
