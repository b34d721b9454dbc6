"""C++ fast path vs NumPy fallback parity."""

import numpy as np
import pytest
import scipy.sparse

from facet_graph_convolution_tpu.geometry import (
    compute_face_normals,
    triangle_barycenters,
)
from facet_graph_convolution_tpu.graph import face_adjacency_klist, klist_to_coo_normal_weighted


def _native_available():
    try:
        from facet_graph_convolution_tpu.graph.native import _load

        _load()
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _native_available(), reason="native lib unavailable")


def test_match_one_level_parity(icosphere, rng):
    from facet_graph_convolution_tpu.graph.coarsen import _match_one_level
    from facet_graph_convolution_tpu.graph.native import match_one_level_native

    v, f = icosphere
    adj = face_adjacency_klist(f, 23)
    coo = klist_to_coo_normal_weighted(
        adj, triangle_barycenters(v, f), compute_face_normals(v, f)
    )
    idx_row, idx_col, val = scipy.sparse.find(coo)
    perm = np.argsort(idx_row, kind="stable")
    rr, cc, vv = idx_row[perm].astype(np.int64), idx_col[perm].astype(np.int64), val[perm]
    n = coo.shape[0]
    weights = np.asarray(coo.sum(axis=0)).squeeze()
    rid = rng.permutation(n)

    import os

    os.environ["FGC_DISABLE_NATIVE"] = "1"
    try:
        py_cluster, py_assoc = _match_one_level(rr, cc, vv, rid, weights, n)
    finally:
        del os.environ["FGC_DISABLE_NATIVE"]
    nat_cluster, nat_assoc = match_one_level_native(rr, cc, vv, rid, weights, n)
    np.testing.assert_array_equal(py_cluster, nat_cluster)
    np.testing.assert_allclose(py_assoc, nat_assoc, rtol=1e-6)


def test_grow_patch_parity(icosphere):
    import os

    from facet_graph_convolution_tpu.graph.native import grow_patch_native
    from facet_graph_convolution_tpu.graph.patching import grow_graph_patch_masked

    v, f = icosphere
    adj = face_adjacency_klist(f, 23)
    n = adj.shape[0]
    mask = np.zeros(n, dtype=np.int8)
    mask[: n // 3] = 1

    os.environ["FGC_DISABLE_NATIVE"] = "1"
    try:
        py_adj, py_old, py_seed = grow_graph_patch_masked(adj, 120, n - 1, mask, 50)
    finally:
        del os.environ["FGC_DISABLE_NATIVE"]
    nat_adj, nat_old, nat_seed = grow_patch_native(adj, 120, n - 1, mask, 50)
    np.testing.assert_array_equal(py_adj, nat_adj)
    np.testing.assert_array_equal(py_old, nat_old)
    assert py_seed == nat_seed


def test_obj_parse_parity(tmp_path):
    """Native OBJ parser must byte-match the Python line loop on the quirky
    cases the loader documents: comments, vn/vt lines, quads (fan
    triangulation), texture/normal face tokens, extra vertex coords."""
    import os

    from facet_graph_convolution_tpu.geometry.obj_io import load_obj

    obj = "\n".join(
        [
            "# a comment",
            "v 0.0 0.0 0.0",
            "v 1.0 0.0 0.0 0.5",       # extra coord (color) — ignored
            "v 1.0 1.0 0.0",
            "v 0.0 1.0 0.25",
            "v 0.5 0.5 1.0",
            "vn 0.0 0.0 1.0",          # stored normals ignored
            "vt 0.5 0.5",
            "g group1",
            "f 1/1/1 2/2/1 3/3/1",
            "f 1 3 4 5",               # quad → two fan triangles
            "",
            "f 2//1 3//1 5//1",
        ]
    )
    p = tmp_path / "mesh.obj"
    p.write_text(obj + "\n")

    # prove the native parser actually runs (otherwise load_obj's silent
    # fallback would compare the Python path against itself)
    from facet_graph_convolution_tpu.graph import native as native_mod

    try:
        native_mod.parse_obj_native(str(p))
    except ImportError:
        pytest.skip("native graph library unavailable")

    v_nat, f_nat, n_nat = load_obj(str(p))
    os.environ["FGC_DISABLE_NATIVE"] = "1"
    try:
        v_py, f_py, n_py = load_obj(str(p))
    finally:
        del os.environ["FGC_DISABLE_NATIVE"]

    np.testing.assert_array_equal(v_nat, v_py)
    np.testing.assert_array_equal(f_nat, f_py)
    assert f_nat.dtype == f_py.dtype
    np.testing.assert_allclose(n_nat, n_py, atol=1e-6)
    assert f_py.shape == (4, 3)


def test_obj_parse_large_roundtrip(tmp_path):
    """Parser round-trips a written icosphere exactly (vertex count >uint16
    threshold path is covered by dtype selection on the small side here)."""
    from facet_graph_convolution_tpu.geometry.obj_io import load_obj, write_obj
    from tests.conftest import make_icosphere

    v, f = make_icosphere(3)
    p = tmp_path / "sphere.obj"
    write_obj(v.astype(np.float32), f.astype(np.int64), str(p))
    v2, f2, _ = load_obj(str(p))
    assert v2.shape == v.shape and f2.shape == f.shape
    np.testing.assert_allclose(v2, v, atol=1e-5)
    np.testing.assert_array_equal(f2.astype(np.int64), f)


def test_obj_parse_refuses_relative_indices(tmp_path):
    """Negative (relative) OBJ face indices are refused by the C parser so
    load_obj falls back to the Python path instead of silently wrapping."""
    from facet_graph_convolution_tpu.graph import native as native_mod

    p = tmp_path / "rel.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -1 -2 -3\n")
    try:
        native_mod._load()
    except ImportError:
        pytest.skip("native graph library unavailable")
    with pytest.raises(OSError):
        native_mod.parse_obj_native(str(p))


def test_obj_parse_truncated_last_line(tmp_path):
    """A vertex line with <3 coords at EOF must be refused (the Python path
    raises on the ragged list), not read past the buffer."""
    from facet_graph_convolution_tpu.graph import native as native_mod

    p = tmp_path / "trunc.obj"
    p.write_text("v 0 0 0\nv 1 2")
    try:
        native_mod._load()
    except ImportError:
        pytest.skip("native graph library unavailable")
    with pytest.raises(OSError):
        native_mod.parse_obj_native(str(p))


def test_face_adjacency_native_parity(rng):
    """C++ face_adjacency == vectorized Python builder bit-for-bit, including
    which connections drop at K overflow (reference getFacesLargeAdj
    semantics, utils.py:243-295)."""
    import os

    from facet_graph_convolution_tpu.graph import native as native_mod
    from facet_graph_convolution_tpu.graph.adjacency import face_adjacency_klist
    from tests.conftest import make_icosphere

    try:
        native_mod._load()
    except ImportError:
        pytest.skip("native graph library unavailable")

    cases = []
    v, f = make_icosphere(2)
    cases.append((f, 23))
    cases.append((f, 7))          # force overflow drops
    # random sliver-free soup: shared vertices with high degrees
    fr = rng.integers(0, 40, size=(200, 3))
    fr = fr[(fr[:, 0] != fr[:, 1]) & (fr[:, 1] != fr[:, 2]) & (fr[:, 0] != fr[:, 2])]
    cases.append((fr, 23))
    cases.append((fr, 9))

    for faces, k in cases:
        faces = np.asarray(faces, dtype=np.int64)
        a_nat, d_nat = native_mod.face_adjacency_native(
            faces, int(faces.max()) + 1, k
        )
        os.environ["FGC_DISABLE_NATIVE"] = "1"
        try:
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                a_py, d_py = face_adjacency_klist(faces, k, return_dropped=True)
        finally:
            del os.environ["FGC_DISABLE_NATIVE"]
        np.testing.assert_array_equal(a_nat, a_py, err_msg=f"k={k}")
        assert d_nat == d_py, (k, d_nat, d_py)


def test_obj_parse_short_vertex_line_midfile(tmp_path):
    """A mid-file 'v' line with <3 coords followed by a line starting with a
    number must be refused, not silently completed with the next line's
    numbers (strtof skips '\\n' as leading whitespace — the parser must bound
    each coordinate scan at the line end; the Python path raises on the
    ragged vertex list)."""
    from facet_graph_convolution_tpu.graph import native as native_mod

    p = tmp_path / "ragged.obj"
    p.write_text("v 0 0\n1 2 3\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    try:
        native_mod._load()
    except ImportError:
        pytest.skip("native graph library unavailable")
    with pytest.raises(OSError):
        native_mod.parse_obj_native(str(p))
