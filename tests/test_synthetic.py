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


def test_noise_scaling():
    v, f = icosphere(2)
    el, _ = average_edge_length(v, f)
    rng = np.random.default_rng(0)
    noisy = add_vertex_noise(v, f, level=0.2, rng=rng)
    disp = np.linalg.norm(noisy - v, axis=1)
    # 3D Gaussian with per-axis σ=0.2·el ⇒ E|d| = σ·sqrt(8/π)
    expected = 0.2 * el * np.sqrt(8 / np.pi)
    assert 0.7 * expected < disp.mean() < 1.3 * expected
