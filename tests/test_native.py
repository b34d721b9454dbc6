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
