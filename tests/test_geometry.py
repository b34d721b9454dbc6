"""Geometry layer tests on analytic meshes (cube, icosphere)."""

import numpy as np
import pytest

from facet_graph_convolution_tpu.geometry import (
    average_edge_length,
    border_faces,
    compute_face_normals,
    compute_vertex_normals,
    edge_map,
    face_adjacency_edges,
    heatmap_colors,
    load_obj,
    triangle_areas,
    triangle_barycenters,
    vertex_faces,
    write_obj,
)
from facet_graph_convolution_tpu.geometry.pointset import (
    bounding_box,
    dense_point_cloud,
    normalize_point_sets,
    point_set_slice,
    random_rotation_matrix,
)


def test_cube_face_normals(cube):
    v, f = cube
    n = compute_face_normals(v, f)
    expected = np.array(
        [
            [0, 0, -1], [0, 0, -1], [0, 0, 1], [0, 0, 1],
            [0, -1, 0], [0, -1, 0], [0, 1, 0], [0, 1, 0],
            [1, 0, 0], [1, 0, 0], [-1, 0, 0], [-1, 0, 0],
        ],
        dtype=np.float32,
    )
    np.testing.assert_allclose(n, expected, atol=1e-5)


def test_sphere_normals_point_outward(icosphere):
    v, f = icosphere
    n = compute_face_normals(v, f)
    centers = triangle_barycenters(v, f, normalize=False)
    dots = np.sum(n * centers / np.linalg.norm(centers, axis=1, keepdims=True), axis=1)
    assert np.all(dots > 0.9)
    vn = compute_vertex_normals(v, f)
    vd = np.sum(vn * v / np.linalg.norm(v, axis=1, keepdims=True), axis=1)
    assert np.all(vd > 0.99)


def test_cube_barycenters(cube):
    v, f = cube
    c = triangle_barycenters(v, f, normalize=False)
    np.testing.assert_allclose(c[0], [2 / 3, 1 / 3, 0.0], atol=1e-6)
    c_norm = triangle_barycenters(v, f, normalize=True)
    np.testing.assert_allclose(c_norm, c / np.sqrt(3.0), atol=1e-6)


def test_cube_areas_and_edges(cube):
    v, f = cube
    areas = triangle_areas(v, f)
    np.testing.assert_allclose(areas, 0.5, atol=1e-6)
    mean_len, count = average_edge_length(v, f)
    assert count == 36
    expected = (24 * 1.0 + 12 * np.sqrt(2.0)) / 36.0
    np.testing.assert_allclose(mean_len, expected, rtol=1e-6)


def test_cube_edge_map(cube):
    v, f = cube
    e_map, v_e_map = edge_map(f)
    assert e_map.shape[0] == 18           # Euler: 12 faces closed mesh → 18 edges
    # every edge of a closed mesh has two faces
    assert np.all(e_map[:, 2] >= 0)
    assert np.all(e_map[:, 3] >= 0)
    # each face appears in exactly 3 edges
    counts = np.bincount(e_map[:, 2:4].reshape(-1), minlength=12)
    np.testing.assert_array_equal(counts, 3)
    # v_e_map: vertex degree in the cube is 4 or 5 (diagonals)
    degrees = np.sum(v_e_map >= 0, axis=1)
    assert degrees.sum() == 36            # each edge counted at both endpoints


def test_cube_border_faces(cube):
    v, f = cube
    assert np.all(border_faces(f) == 0)   # closed mesh: no borders
    # removing two faces exposes borders
    open_f = f[:-2]
    b = border_faces(open_f)
    assert b.sum() > 0


def test_face_adjacency_edges(cube):
    v, f = cube
    fadj, e_map, _ = face_adjacency_edges(f)
    assert fadj.shape == (12, 4)
    np.testing.assert_array_equal(fadj[:, 0], np.arange(12) + 1)
    # closed manifold: every face has exactly 3 edge-neighbours
    assert np.all(np.count_nonzero(fadj[:, 1:], axis=1) == 3)
    # symmetry
    for i in range(12):
        for j in fadj[i, 1:] - 1:
            assert (i + 1) in fadj[j, 1:]


def test_vertex_faces(cube):
    v, f = cube
    vf = vertex_faces(f, k_v=10)
    counts = np.sum(vf >= 0, axis=1)
    assert counts.sum() == 36
    for vert in range(8):
        for face in vf[vert][vf[vert] >= 0]:
            assert vert in f[face]
    # fake faces (-1) are skipped
    f_fake = np.concatenate([f, -np.ones((3, 3), np.int64)], axis=0)
    vf2 = vertex_faces(f_fake, k_v=10, vnum=8)
    np.testing.assert_array_equal(vf, vf2)


def test_obj_roundtrip(tmp_path, icosphere):
    v, f = icosphere
    path = str(tmp_path / "sphere.obj")
    write_obj(v, f, path)
    v2, f2, n2 = load_obj(path)
    np.testing.assert_allclose(v, v2, atol=1e-5)
    np.testing.assert_array_equal(f, f2)
    assert n2.shape == v.shape


def test_obj_fake_face_handling(tmp_path, cube):
    v, f = cube
    f_padded = np.concatenate([f, np.zeros((2, 3), np.int64)], axis=0)
    path = str(tmp_path / "cube.obj")
    write_obj(v, f_padded, path)
    _, f2, _ = load_obj(path)
    assert f2.shape[0] == 12              # sentinel rows dropped


def test_heatmap_colors():
    c = heatmap_colors(np.array([0.0, 0.25, 0.5, 0.75, 1.0]))
    np.testing.assert_allclose(c[0], [0, 0, 1], atol=1e-6)   # blue
    np.testing.assert_allclose(c[1], [0, 1, 1], atol=1e-6)   # cyan
    np.testing.assert_allclose(c[2], [0, 1, 0], atol=1e-6)   # green
    np.testing.assert_allclose(c[3], [1, 1, 0], atol=1e-6)   # yellow
    np.testing.assert_allclose(c[4], [1, 0, 0], atol=1e-6)   # red


def test_pointset_utils(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    box = bounding_box(pts)
    assert np.all(box[:, 0] <= box[:, 1])
    a, b = normalize_point_sets(pts, pts * 2)
    diag = np.sqrt(np.sum((np.maximum(pts.max(0), (pts * 2).max(0))
                           - np.minimum(pts.min(0), (pts * 2).min(0))) ** 2))
    np.testing.assert_allclose(a, pts / diag, rtol=1e-5)
    sl = point_set_slice(pts, np.array([[0, 1], [0, 1], [0, 1]], np.float32))
    assert np.all(sl >= 0) and np.all(sl <= 1)


def test_dense_point_cloud(cube):
    v, f = cube
    dense = dense_point_cloud(v, f, res=4)
    assert dense.shape[0] > v.shape[0]
    np.testing.assert_allclose(dense[: v.shape[0]], v)


def test_random_rotation_is_orthonormal(rng):
    for _ in range(10):
        m = random_rotation_matrix(rng=rng)
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-10)
