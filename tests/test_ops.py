"""Device-op tests: conv variants vs NumPy oracle, pooling, normalization,
vertex solvers."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facet_graph_convolution_tpu.geometry import (
    compute_face_normals,
    edge_map,
    triangle_barycenters,
    vertex_faces,
)
from facet_graph_convolution_tpu.graph import face_adjacency_klist
from facet_graph_convolution_tpu.ops import (
    FacetConvVariant,
    face_centers_pyramid,
    facet_conv,
    facet_conv_gather,
    facet_conv_pos_assignment,
    gather_neighbors,
    init_facet_conv,
    init_facet_conv_pos_assignment,
    init_linear,
    linear,
    lrelu,
    normalize_tensor,
    tree_pool,
    tree_unpool,
    update_positions_edges,
    update_positions_multiscale,
)
from facet_graph_convolution_tpu.ops.conv import rotation_to_axis


def random_graph(rng, n=64, k=9, c=6):
    """Random K-list graph with contiguous fill and some fully-padded rows
    (fake nodes keep only the self slot like the reference)."""
    x = rng.normal(size=(n, c)).astype(np.float32)
    adj = np.zeros((n, k), dtype=np.int32)
    adj[:, 0] = np.arange(n) + 1
    for i in range(n):
        deg = rng.integers(0, k - 1)
        nbrs = rng.choice(n, size=deg, replace=False)
        adj[i, 1 : 1 + deg] = nbrs + 1
    # a few fake nodes: zero signal, self-only adjacency
    fakes = rng.choice(n, size=4, replace=False)
    x[fakes] = 0
    adj[fakes, 1:] = 0
    return x, adj


def conv_oracle_numpy(params, x, adj):
    """Direct NumPy transcription of custom_conv2d default math
    (model.py:427-504)."""
    w = np.asarray(params["w"])      # [M, out, in]
    b = np.asarray(params["b"])
    u = np.asarray(params["u"])      # [M, in]
    v = np.asarray(params["v"])
    c = np.asarray(params["c"])
    m, out_ch, in_ch = w.shape
    n, k = adj.shape
    x_pad = np.concatenate([np.zeros((1, in_ch), np.float32), x], axis=0)
    x_nbr = x_pad[adj]               # [N, K, C]
    logits = x @ u.T                 # [N, M]
    logits = logits[:, None, :] + x_nbr @ v.T + c
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    q = e / e.sum(axis=-1, keepdims=True)
    wx = x_pad @ w.reshape(m * out_ch, in_ch).T
    wx_nbr = wx[adj].reshape(n, k, m, out_ch)
    deg = np.count_nonzero(adj, axis=-1)
    inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
    y = np.einsum("nkm,nkmo->no", q, wx_nbr) * inv[:, None]
    return np.where((deg > 0)[:, None], y + b, y)


def test_gather_neighbors(rng):
    x, adj = random_graph(rng)
    g = np.asarray(gather_neighbors(jnp.asarray(x), jnp.asarray(adj)))
    x_pad = np.concatenate([np.zeros((1, x.shape[1]), np.float32), x], axis=0)
    np.testing.assert_allclose(g, x_pad[adj], rtol=1e-6)


@pytest.mark.parametrize("variant", list(FacetConvVariant))
def test_fast_conv_matches_gather_conv(rng, variant):
    x, adj = random_graph(rng, c=6)
    key = jax.random.PRNGKey(0)
    params = init_facet_conv(key, 6, 16, 9, variant=variant)

    @jax.jit
    def both(params, x, adj):
        return (
            facet_conv(params, x, adj, variant=variant),
            facet_conv_gather(params, x, adj, variant=variant),
        )

    fast, ref = both(params, jnp.asarray(x), jnp.asarray(adj))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=2e-5)


def test_conv_matches_numpy_oracle(rng):
    x, adj = random_graph(rng, c=6)
    params = init_facet_conv(jax.random.PRNGKey(1), 6, 8, 9)
    y = jax.jit(facet_conv)(params, jnp.asarray(x), jnp.asarray(adj))
    oracle = conv_oracle_numpy(params, x, adj)
    np.testing.assert_allclose(np.asarray(y), oracle, atol=2e-5)


def test_conv_pos_assignment_uses_position_only_in_q(rng):
    x, adj = random_graph(rng, c=6)
    params = init_facet_conv_pos_assignment(jax.random.PRNGKey(2), 6, 8, 9)
    y = facet_conv_pos_assignment(params, jnp.asarray(x), jnp.asarray(adj))
    assert y.shape == (x.shape[0], 8)
    # shifting positions uniformly must leave output unchanged: the position
    # block of the assignment is forced translation-invariant (model.py:656-658)
    # for REAL neighbours; padded slots break exact invariance in the
    # reference too (zero-row gather) — so test on a fully-connected graph.
    n = 8
    adj_full = np.zeros((n, n + 1), np.int32)
    adj_full[:, 0] = np.arange(n) + 1
    for i in range(n):
        others = [j + 1 for j in range(n) if j != i]
        adj_full[i, 1 : n] = others
    xs = x[:n].copy()
    shifted = xs.copy()
    shifted[:, 3:] += np.array([0.3, -0.2, 0.7], np.float32)
    y1 = facet_conv_pos_assignment(params, jnp.asarray(xs), jnp.asarray(adj_full))
    y2 = facet_conv_pos_assignment(params, jnp.asarray(shifted), jnp.asarray(adj_full))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_rotation_to_axis(rng):
    n = rng.normal(size=(50, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    rot = np.asarray(rotation_to_axis(jnp.asarray(n)))
    aligned = np.einsum("nij,nj->ni", rot, n)
    np.testing.assert_allclose(aligned, np.tile([0, 0, 1.0], (50, 1)), atol=1e-5)
    # orthonormality
    prod = np.einsum("nij,nkj->nik", rot, rot)
    np.testing.assert_allclose(prod, np.tile(np.eye(3), (50, 1, 1)), atol=1e-5)


def test_tree_pool_modes():
    x = jnp.asarray(
        np.array(
            [[1, 2], [3, 4], [0, 0], [5, 6], [2, 2], [4, 4], [0, 0], [0, 0]],
            np.float32,
        )
    )
    mx = np.asarray(tree_pool(x, steps=1, mode="max"))
    np.testing.assert_allclose(mx, [[3, 4], [5, 6], [4, 4], [0, 0]])
    avg = np.asarray(tree_pool(x, steps=1, mode="avg"))
    np.testing.assert_allclose(avg, [[2, 3], [2.5, 3], [3, 3], [0, 0]])
    # avg_ignore_zeros: all-zero sibling replaced by partner
    iz = np.asarray(tree_pool(x, steps=1, mode="avg_ignore_zeros"))
    np.testing.assert_allclose(iz, [[2, 3], [5, 6], [3, 3], [0, 0]])
    # two-step pooling on 2-step groups of 4
    iz2 = np.asarray(tree_pool(x, steps=2, mode="avg_ignore_zeros"))
    np.testing.assert_allclose(iz2, [[3.5, 4.5], [3, 3]])


def test_tree_unpool_inverts_shape():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    up = np.asarray(tree_unpool(x, steps=2))
    assert up.shape == (12, 4)
    np.testing.assert_allclose(up[:4], np.tile(x[0], (4, 1)))


def test_normalize_tensor_matches_reference_sequence(rng):
    x = rng.normal(size=(40, 3)).astype(np.float32) * 0.01
    out = np.asarray(normalize_tensor(jnp.asarray(x)))
    eps = 1e-5
    xs = x / (np.abs(x).mean() + eps)
    norm = np.sqrt(eps + np.sum(xs**2, axis=-1))
    inv = np.where(norm > eps, 1.0 / (norm + eps), 0.0)
    np.testing.assert_allclose(out, xs * inv[:, None], atol=1e-6)
    # rows normalize to ~unit length
    lens = np.linalg.norm(out, axis=1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-2)
    # zero rows stay zero
    z = np.zeros((4, 3), np.float32)
    z[0] = [1, 0, 0]
    zn = np.asarray(normalize_tensor(jnp.asarray(z)))
    np.testing.assert_allclose(zn[1:], 0.0, atol=1e-6)


def test_lrelu():
    x = jnp.asarray(np.array([-2.0, -0.5, 0.0, 0.5, 2.0], np.float32))
    np.testing.assert_allclose(
        np.asarray(lrelu(x, 0.1)), [-0.2, -0.05, 0, 0.5, 2.0], rtol=1e-6
    )


def test_linear(rng):
    params = init_linear(jax.random.PRNGKey(3), 4, 7)
    x = rng.normal(size=(10, 4)).astype(np.float32)
    y = np.asarray(linear(params, jnp.asarray(x)))
    np.testing.assert_allclose(
        y, x @ np.asarray(params["w"]) + np.asarray(params["b"]), atol=1e-6
    )


# ---------------------------------------------------------------------------
# Vertex solvers
# ---------------------------------------------------------------------------

def test_update_positions_edges_flattens_noise(cube, rng):
    """A noisy cube filtered with its GT face normals must move back toward
    the planes (Taubin filtering, train.py:1467-1557)."""
    v, f = cube
    gt_normals = compute_face_normals(v, f)
    e_map, v_e_map = edge_map(f, max_edges=20)
    noisy = v + rng.normal(scale=0.05, size=v.shape).astype(np.float32)

    out = np.asarray(
        update_positions_edges(
            jnp.asarray(noisy),
            jnp.asarray(gt_normals),
            jnp.asarray(e_map),
            jnp.asarray(v_e_map),
            iter_num=60,
        )
    )
    # plane agreement: each face's vertices should be closer to coplanar with
    # the GT normal after solving
    def planarity(verts):
        tri = verts[np.asarray(f, np.int64)]
        n = gt_normals
        spread = 0.0
        for i in range(3):
            d = np.sum((tri[:, i] - tri.mean(axis=1)) * n, axis=-1)
            spread += np.abs(d).mean()
        return spread

    assert planarity(out) < 0.3 * planarity(noisy)


def test_update_positions_edges_adaptive_and_degree(cube, rng):
    """Round-5 solver options: the residual-plateau stop must leave a
    nearly-clean input almost untouched (the fixed schedule drifts it), the
    degree-scaled step must still flatten noise, and tol=0 + λ=1/18 stays
    the exact reference path."""
    v, f = cube
    gt_normals = compute_face_normals(v, f)
    e_map, v_e_map = edge_map(f, max_edges=20)

    def solve(x, **kw):
        return np.asarray(update_positions_edges(
            jnp.asarray(x), jnp.asarray(gt_normals), jnp.asarray(e_map),
            jnp.asarray(v_e_map), iter_num=60, **kw))

    # nearly-clean input: adaptive stop must move it (much) less than the
    # fixed schedule does
    clean = v + rng.normal(scale=1e-4, size=v.shape).astype(np.float32)
    d_fixed = np.abs(solve(clean) - clean).max()
    d_adapt = np.abs(solve(clean, adaptive_tol=0.01) - clean).max()
    assert d_adapt <= d_fixed

    # degree-scaled step still flattens real noise
    noisy = v + rng.normal(scale=0.05, size=v.shape).astype(np.float32)
    out = solve(noisy, lmbd="degree", adaptive_tol=0.01)

    def planarity(verts):
        tri = verts[np.asarray(f, np.int64)]
        spread = 0.0
        for i in range(3):
            d = np.sum((tri[:, i] - tri.mean(axis=1)) * gt_normals, axis=-1)
            spread += np.abs(d).mean()
        return spread

    assert planarity(out) < 0.7 * planarity(noisy)

    # the cube is valence-4/6 so "degree" ≠ 1/18 rows exist; but tol=0 with
    # the default λ must be bit-identical to the original fixed path
    np.testing.assert_array_equal(solve(noisy), solve(noisy, adaptive_tol=0.0))


def test_update_positions_edges_trust_cap(cube, rng):
    """solver_trust caps per-vertex displacement at trust × the initial RMS
    constraint violation: a tiny trust pins the output near the input, a
    huge trust reproduces the uncapped solve, and in between displacement
    norms never exceed the cap."""
    v, f = cube
    gt_normals = compute_face_normals(v, f)
    e_map, v_e_map = edge_map(f, max_edges=20)
    noisy = v + rng.normal(scale=0.05, size=v.shape).astype(np.float32)

    def solve(**kw):
        return np.asarray(update_positions_edges(
            jnp.asarray(noisy), jnp.asarray(gt_normals), jnp.asarray(e_map),
            jnp.asarray(v_e_map), iter_num=40, lmbd="degree", **kw))

    base = solve()
    tiny = solve(trust=1e-6)
    assert np.abs(tiny - noisy).max() < 1e-4
    huge = solve(trust=1e6)
    np.testing.assert_allclose(huge, base, atol=1e-6)

    # mid trust: every displacement obeys the cap
    tr = 0.75
    capped = solve(trust=tr)
    xv = noisy[np.asarray(e_map)[:, :2].astype(np.int64)]
    # recompute r0 per vertex like the solver does
    v_edges1 = np.asarray(v_e_map).astype(np.int64) + 1
    em = np.asarray(e_map).astype(np.int64) + np.array([[0, 0, 1, 1]])
    em = np.concatenate([np.zeros((1, 4), np.int64), em], axis=0)
    fn_pad = np.concatenate([np.zeros((1, 3), np.float32), gt_normals], axis=0)
    ne = em[v_edges1]
    n_f = fn_pad[ne[..., 2:4]]
    s = np.sum(noisy[ne[..., 0:2]] - noisy[:, None, None, :], axis=2)
    proj = np.sum(n_f * s[:, :, None, :], axis=-1)
    cnt = np.maximum(2.0 * np.sum(np.asarray(v_e_map) >= 0, axis=1), 1.0)
    cap = tr * np.sqrt(np.sum(proj ** 2, axis=(1, 2)) / cnt)
    disp = np.linalg.norm(capped - noisy, axis=1)
    assert np.all(disp <= cap * (1 + 1e-5))


def test_update_positions_edges_degree_stable_on_fan(rng):
    """High-valence fan (a 16-triangle umbrella): the reference's global
    λ=1/18 step diverges (residual grows), the degree-scaled step stays
    stable — the measured cylinder-on-plate failure in miniature."""
    n = 24
    hub = np.array([[0.0, 0.0, 0.0]], np.float32)
    ring = np.stack([np.cos(np.linspace(0, 2 * np.pi, n, endpoint=False)),
                     np.sin(np.linspace(0, 2 * np.pi, n, endpoint=False)),
                     np.zeros(n)], axis=1).astype(np.float32)
    v = np.concatenate([hub, ring], axis=0)
    f = np.stack([np.zeros(n, np.int64), np.arange(1, n + 1),
                  np.roll(np.arange(1, n + 1), -1)], axis=1)
    normals = compute_face_normals(v, f)
    e_map, v_e_map = edge_map(f, max_edges=2 * n)
    noisy = v + rng.normal(scale=0.02, size=v.shape).astype(np.float32)

    def spread(x):
        return float(np.abs(np.asarray(x)[:, 2]).max())

    out_ref = update_positions_edges(
        jnp.asarray(noisy), jnp.asarray(normals), jnp.asarray(e_map),
        jnp.asarray(v_e_map), iter_num=60, lmbd=1.0 / 18.0)
    out_deg = update_positions_edges(
        jnp.asarray(noisy), jnp.asarray(normals), jnp.asarray(e_map),
        jnp.asarray(v_e_map), iter_num=60, lmbd="degree")
    # flat fan: z-spread measures constraint violation directly
    assert spread(out_deg) < spread(jnp.asarray(noisy))
    assert spread(out_deg) < spread(out_ref)


def test_update_positions_edges_differentiable(cube, rng):
    v, f = cube
    gt_normals = compute_face_normals(v, f)
    e_map, v_e_map = edge_map(f, max_edges=20)
    noisy = jnp.asarray(v + rng.normal(scale=0.05, size=v.shape).astype(np.float32))

    def loss(normals):
        out = update_positions_edges(
            noisy, normals, jnp.asarray(e_map), jnp.asarray(v_e_map), iter_num=10
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(jnp.asarray(gt_normals))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)


def test_face_centers_pyramid(cube):
    v, f = cube
    faces16 = np.concatenate([f, -np.ones((4, 3), np.int64)], axis=0)  # pad to 16
    levels = face_centers_pyramid(jnp.asarray(v), jnp.asarray(faces16), 2, levels=3)
    assert levels[0].shape == (16, 3)
    assert levels[1].shape == (4, 3)
    assert levels[2].shape == (1, 3)
    # fake faces have zero centers
    np.testing.assert_allclose(np.asarray(levels[0][12:]), 0.0, atol=1e-7)
    # real centroids match
    np.testing.assert_allclose(
        np.asarray(levels[0][:12]),
        triangle_barycenters(v, f, normalize=False),
        atol=1e-6,
    )


def test_update_positions_multiscale_runs_and_improves(cube, rng):
    v, f = cube
    faces16 = np.concatenate([f, -np.ones((4, 3), np.int64)], axis=0)
    gt_n = compute_face_normals(v, f)
    n_padded = np.concatenate([gt_n, np.zeros((4, 3), np.float32)], axis=0)
    n_mid = np.asarray(tree_pool(jnp.asarray(n_padded), 2, "avg_ignore_zeros"))
    n_coarse = np.asarray(tree_pool(jnp.asarray(n_mid), 2, "avg_ignore_zeros"))
    v_f = vertex_faces(faces16, k_v=25, vnum=8)
    noisy = v + rng.normal(scale=0.05, size=v.shape).astype(np.float32)

    out, dx = update_positions_multiscale(
        jnp.asarray(noisy),
        [jnp.asarray(n_padded), jnp.asarray(n_mid), jnp.asarray(n_coarse)],
        jnp.asarray(faces16),
        jnp.asarray(v_f),
        coarsening_steps=2,
        iter_nums=(40, 20, 20),
    )
    assert len(dx) == 3
    out = np.asarray(out)

    def planarity(verts):
        tri = verts[np.asarray(f, np.int64)]
        spread = 0.0
        for i in range(3):
            d = np.sum((tri[:, i] - tri.mean(axis=1)) * gt_n, axis=-1)
            spread += np.abs(d).mean()
        return spread

    assert planarity(out) < planarity(noisy)


@pytest.mark.parametrize("face_tables", [False, True])
def test_update_positions_multiscale_operator_parity(cube, rng, face_tables):
    """The linear-operator (deduped, scatter-free) solver reproduces the
    naive per-slot body to fp tolerance — values AND gradients through both
    x and the normals. ``face_tables=True`` additionally swaps the
    per-iteration center-pyramid recomputation for the static A_s·x
    incidence tables (round-5 follow-up) — same oracle, same bar, and the
    fake-face group (faces 12-15 → a fake mid node) exercises the
    structural avg_ignore_zeros weight nesting."""
    import jax

    from facet_graph_convolution_tpu.ops.vertex_update import (
        build_solver_tables,
        update_positions_multiscale_operator,
    )

    v, f = cube
    faces16 = np.concatenate([f, -np.ones((4, 3), np.int64)], axis=0)
    gt_n = compute_face_normals(v, f)
    n_padded = np.concatenate([gt_n, np.zeros((4, 3), np.float32)], axis=0)
    n_padded += rng.normal(scale=0.05, size=n_padded.shape).astype(np.float32)
    n_padded[12:] = 0.0
    n_mid = np.asarray(tree_pool(jnp.asarray(n_padded), 2, "avg_ignore_zeros"))
    n_coarse = np.asarray(tree_pool(jnp.asarray(n_mid), 2, "avg_ignore_zeros"))
    v_f = vertex_faces(faces16, k_v=25, vnum=8)
    noisy = (v + rng.normal(scale=0.05, size=v.shape)).astype(np.float32)
    normals = [jnp.asarray(n_padded), jnp.asarray(n_mid), jnp.asarray(n_coarse)]
    tables = build_solver_tables(v_f, [16, 4, 1], 8, coarsening_steps=2,
                                 faces=faces16 if face_tables else None)

    def run_ref(x, ns):
        out, dx = update_positions_multiscale(
            x, ns, jnp.asarray(faces16), jnp.asarray(v_f),
            coarsening_steps=2, iter_nums=(40, 20, 20))
        return out, dx

    def run_op(x, ns):
        out, dx = update_positions_multiscale_operator(
            x, ns, jnp.asarray(faces16), jnp.asarray(v_f), tables,
            coarsening_steps=2, iter_nums=(40, 20, 20))
        return out, dx

    out_r, dx_r = run_ref(jnp.asarray(noisy), normals)
    out_o, dx_o = run_op(jnp.asarray(noisy), normals)
    np.testing.assert_allclose(np.asarray(out_o), np.asarray(out_r),
                               atol=2e-5, rtol=1e-4)
    for a, b in zip(dx_o, dx_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)

    # gradient parity through a scalar functional of the output
    def loss_ref(x, ns):
        return jnp.sum(jnp.sin(run_ref(x, ns)[0]))

    def loss_op(x, ns):
        return jnp.sum(jnp.sin(run_op(x, ns)[0]))

    gx_r, gn_r = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(noisy), normals)
    gx_o, gn_o = jax.grad(loss_op, argnums=(0, 1))(jnp.asarray(noisy), normals)
    np.testing.assert_allclose(np.asarray(gx_o), np.asarray(gx_r),
                               atol=5e-4, rtol=1e-3)
    for a, b in zip(gn_o, gn_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)
