"""Synthetic shape generator tests."""

import numpy as np

from facet_graph_convolution_tpu.data.synthetic import (
    add_vertex_noise,
    box,
    icosphere,
    torus,
)
from facet_graph_convolution_tpu.geometry import (
    border_faces,
    compute_face_normals,
    triangle_areas,
)
from facet_graph_convolution_tpu.geometry.mesh_math import average_edge_length


def test_icosphere_closed():
    v, f = icosphere(2)
    assert f.shape[0] == 320
    assert np.all(border_faces(f) == 0)
    radii = np.linalg.norm(v, axis=1)
    np.testing.assert_allclose(radii, 1.0, atol=1e-6)


def test_torus_closed_and_consistent():
    v, f = torus(nu=24, nv=12)
    assert f.shape[0] == 24 * 12 * 2
    assert np.all(border_faces(f) == 0)
    assert np.all(triangle_areas(v, f) > 0)
    # normals point away from the tube axis ring
    n = compute_face_normals(v, f)
    assert np.all(np.isfinite(n))


def test_box_closed_watertight():
    v, f = box(4, 4, 4)
    assert np.all(border_faces(f) == 0)
    # outward normals: dot with (center → face centroid) positive
    from facet_graph_convolution_tpu.geometry import triangle_barycenters

    n = compute_face_normals(v, f)
    c = triangle_barycenters(v, f, normalize=False) - np.array([0.5, 0.5, 0.5])
    # each face lies on one box side; its normal aligns with that axis
    dots = np.sum(n * c, axis=1)
    assert np.all(dots > 0)


def test_chamfered_box_watertight_manifold():
    from facet_graph_convolution_tpu.data.synthetic import chamfered_box

    v, f = chamfered_box(8)
    assert np.all(border_faces(f) == 0)
    edges = np.sort(
        np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert np.all(counts == 2)                  # watertight 2-manifold
    assert np.all(triangle_areas(v, f) > 1e-9)  # no degenerate faces
    # outward winding: positive signed volume ≈ cube minus chamfer cuts
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    vol = np.sum(np.einsum("ij,ij->i", p0.astype(np.float64),
                           np.cross(p1, p2).astype(np.float64))) / 6.0
    assert 0.6 < vol < 1.0


def test_cylinder_on_plate_watertight_manifold():
    from facet_graph_convolution_tpu.data.synthetic import cylinder_on_plate

    v, f = cylinder_on_plate(32, n_h=3, n_r=3)
    assert np.all(border_faces(f) == 0)
    edges = np.sort(
        np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert np.all(counts == 2)
    assert np.all(triangle_areas(v, f) > 1e-9)
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    vol = np.sum(np.einsum("ij,ij->i", p0.astype(np.float64),
                           np.cross(p1, p2).astype(np.float64))) / 6.0
    expect = np.pi * (1.0**2 * 0.2 + 0.45**2 * 0.8)
    assert abs(vol - expect) / expect < 0.05


def test_subdivide_mesh_structure():
    from facet_graph_convolution_tpu.data.synthetic import subdivide_mesh

    v, f = icosphere(1)
    v2, f2 = subdivide_mesh(v, f)
    assert f2.shape[0] == 4 * f.shape[0]
    # V' = V + E (one midpoint per edge); Euler: E = V + F − 2
    assert v2.shape[0] == v.shape[0] + (v.shape[0] + f.shape[0] - 2)
    assert np.all(border_faces(f2) == 0)


def test_noise_scaling():
    v, f = icosphere(2)
    el, _ = average_edge_length(v, f)
    rng = np.random.default_rng(0)
    noisy = add_vertex_noise(v, f, level=0.2, rng=rng)
    disp = np.linalg.norm(noisy - v, axis=1)
    # 3D Gaussian with per-axis σ=0.2·el ⇒ E|d| = σ·sqrt(8/π)
    expected = 0.2 * el * np.sqrt(8 / np.pi)
    assert 0.7 * expected < disp.mean() < 1.3 * expected
