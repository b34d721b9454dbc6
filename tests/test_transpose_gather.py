"""Transpose-adjacency (scatter-free) gather backward parity."""

import jax
import jax.numpy as jnp
import numpy as np

from facet_graph_convolution_tpu.graph.convert import transpose_adjacency
from facet_graph_convolution_tpu.ops.gather import gather_neighbors


def random_klist(rng, n=40, k=7):
    adj = np.zeros((n, k), np.int32)
    adj[:, 0] = np.arange(n) + 1
    for i in range(n):
        deg = rng.integers(0, k - 1)
        adj[i, 1 : 1 + deg] = rng.choice(n, size=deg, replace=False) + 1
    return adj


def test_transpose_structure(rng):
    adj = random_klist(rng)
    adj_t = transpose_adjacency(adj)
    n, k = adj.shape
    # every (i, k) slot with a target appears exactly once in adj_t
    pairs = set()
    for j in range(n):
        for slot in adj_t[j]:
            if slot > 0:
                flat = slot - 1
                i, kk = divmod(int(flat), k)
                assert adj[i, kk] == j + 1
                pairs.add(int(flat))
    expected = {i * k + kk for i in range(n) for kk in range(k) if adj[i, kk] > 0}
    assert pairs == expected


def test_gather_backward_matches(rng):
    adj = random_klist(rng)
    adj_t = transpose_adjacency(adj)
    n = adj.shape[0]
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(n, adj.shape[1], 5)).astype(np.float32))

    def f_plain(x):
        return jnp.sum(gather_neighbors(x, jnp.asarray(adj)) * cot)

    def f_t(x):
        return jnp.sum(
            gather_neighbors(x, jnp.asarray(adj), jnp.asarray(adj_t)) * cot
        )

    # forward identical
    np.testing.assert_allclose(
        np.asarray(gather_neighbors(x, jnp.asarray(adj))),
        np.asarray(gather_neighbors(x, jnp.asarray(adj), jnp.asarray(adj_t))),
    )
    g_plain = jax.jit(jax.grad(f_plain))(x)
    g_t = jax.jit(jax.grad(f_t))(x)
    np.testing.assert_allclose(np.asarray(g_plain), np.asarray(g_t), atol=1e-5)


def test_unet_grads_match_with_transpose(rng):
    from facet_graph_convolution_tpu.models.unet import init_unet, unet_apply

    adjs, adj_ts = [], []
    n = 64
    for _ in range(3):
        adj = random_klist(rng, n=n, k=7)
        adjs.append(jnp.asarray(adj))
        adj_ts.append(jnp.asarray(transpose_adjacency(adj)))
        n //= 4
    x = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32))
    params = init_unet(jax.random.PRNGKey(0), in_channels=6,
                       channels=(8, 16, 32), num_filters=4, fc_channels=32)

    def loss_plain(p):
        return jnp.sum(unet_apply(p, x, adjs) ** 2)

    def loss_t(p):
        return jnp.sum(unet_apply(p, x, adjs, adj_ts=adj_ts) ** 2)

    g0 = jax.jit(jax.grad(loss_plain))(params)
    g1 = jax.jit(jax.grad(loss_t))(params)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_dedupe_klist_conv_parity(rng):
    """Deduped adjacency + multiplicity weights reproduce the raw K-list conv
    exactly (duplicate slots carry identical q)."""
    from facet_graph_convolution_tpu.graph.convert import dedupe_klist
    from facet_graph_convolution_tpu.ops.conv import facet_conv, init_facet_conv

    n, k = 48, 9
    adj = np.zeros((n, k), np.int32)
    adj[:, 0] = np.arange(n) + 1
    for i in range(n):
        deg = int(rng.integers(1, k - 1))
        nbrs = rng.choice(n, size=deg, replace=True)  # duplicates on purpose
        adj[i, 1 : 1 + deg] = nbrs + 1
    adj_u, mult = dedupe_klist(adj)
    assert adj_u.shape[1] <= k
    np.testing.assert_allclose(
        mult.sum(axis=1), np.count_nonzero(adj, axis=1), rtol=1e-6
    )

    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    params = init_facet_conv(jax.random.PRNGKey(0), 6, 8, 4)

    @jax.jit
    def both(params, x):
        raw = facet_conv(params, x, jnp.asarray(adj))
        dd = facet_conv(params, x, jnp.asarray(adj_u), mult=jnp.asarray(mult))
        return raw, dd

    raw, dd = both(params, x)
    np.testing.assert_allclose(np.asarray(raw), np.asarray(dd), atol=2e-5)


def test_dedupe_rotation_invariant_parity(rng):
    """Regression: the rotation-invariant path must honor multiplicity too."""
    from facet_graph_convolution_tpu.graph.convert import dedupe_klist
    from facet_graph_convolution_tpu.ops.conv import (
        FacetConvVariant,
        facet_conv,
        init_facet_conv,
    )

    n, k = 32, 9
    adj = np.zeros((n, k), np.int32)
    adj[:, 0] = np.arange(n) + 1
    for i in range(n):
        deg = int(rng.integers(1, k - 1))
        adj[i, 1 : 1 + deg] = rng.choice(n, size=deg, replace=True) + 1
    adj_u, mult = dedupe_klist(adj)
    assert np.any(mult > 1)     # ensure the case actually has duplicates

    x = rng.normal(size=(n, 6)).astype(np.float32)
    x[:, :3] /= np.linalg.norm(x[:, :3], axis=1, keepdims=True)
    params = init_facet_conv(
        jax.random.PRNGKey(0), 6, 8, 4, variant=FacetConvVariant.ROTATION_INVARIANT
    )

    @jax.jit
    def both(params, x):
        raw = facet_conv(params, x, jnp.asarray(adj),
                         variant=FacetConvVariant.ROTATION_INVARIANT)
        dd = facet_conv(params, x, jnp.asarray(adj_u),
                        variant=FacetConvVariant.ROTATION_INVARIANT,
                        mult=jnp.asarray(mult))
        return raw, dd

    raw, dd = both(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(raw), np.asarray(dd), atol=2e-5)


def test_self_split_parity(rng):
    """Self-split conv (local self term, neighbours-only gather) must match
    the raw K-list conv exactly, values and parameter gradients."""
    from facet_graph_convolution_tpu.graph.convert import (
        dedupe_klist,
        split_self_klist,
        transpose_adjacency,
    )
    from facet_graph_convolution_tpu.ops.conv import facet_conv, init_facet_conv

    n, k = 48, 9
    adj = np.zeros((n, k), np.int32)
    adj[:, 0] = np.arange(n) + 1
    for i in range(n):
        deg = int(rng.integers(0, k - 1))
        adj[i, 1 : 1 + deg] = rng.choice(n, size=deg, replace=True) + 1
    adj_u, mult = dedupe_klist(adj)
    adj_n, mult_n, self_mult = split_self_klist(adj_u, mult)
    assert adj_n.shape[1] < adj_u.shape[1]          # self slot removed
    assert np.all(self_mult >= 1.0)   # choice-with-replacement can re-pick self
    adj_t = transpose_adjacency(adj_n)

    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    params = init_facet_conv(jax.random.PRNGKey(0), 6, 8, 4)
    args_split = dict(
        adj_t=jnp.asarray(adj_t),
        mult=(jnp.asarray(mult_n), jnp.asarray(self_mult)),
    )

    def f_raw(params, x):
        return facet_conv(params, x, jnp.asarray(adj))

    def f_split(params, x):
        return facet_conv(params, x, jnp.asarray(adj_n), **args_split)

    y_raw = jax.jit(f_raw)(params, x)
    y_split = jax.jit(f_split)(params, x)
    np.testing.assert_allclose(np.asarray(y_raw), np.asarray(y_split), atol=2e-5)

    def loss(f):
        return lambda p, x: jnp.sum(f(p, x) ** 2)

    g_raw = jax.jit(jax.grad(loss(f_raw), argnums=(0, 1)))(params, x)
    g_split = jax.jit(jax.grad(loss(f_split), argnums=(0, 1)))(params, x)
    for a, b in zip(jax.tree.leaves(g_raw), jax.tree.leaves(g_split)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_patch_arrays_self_split_step_parity(rng):
    """A full train step on self-split arrays matches the non-split arrays."""
    import jax

    from __graft_entry__ import _make_patch
    from facet_graph_convolution_tpu.config import default_config
    from facet_graph_convolution_tpu.training.trainer import (
        _patch_arrays,
        create_train_state,
        make_normals_train_step,
    )

    patch = _make_patch(subdiv=3, seed=3)
    cfg = default_config()
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_normals_train_step(tx, cfg)
    key = jax.random.PRNGKey(7)

    losses = []
    states = []
    for kw in (dict(split_self=False), dict(nminor=False), dict(),
               dict(lane=True)):
        x, adjs, gt, adj_ts, mults = _patch_arrays(patch, **kw)
        st, loss = step(state, x, adjs, gt, key, adj_ts, mults)
        losses.append(float(loss))
        states.append(st)
    assert abs(losses[0] - losses[1]) < 1e-4
    assert abs(losses[0] - losses[2]) < 1e-4    # node-minor fast path
    assert abs(losses[0] - losses[3]) < 1e-4    # lane-axis gather form
    for a, b in zip(jax.tree.leaves(states[0].params), jax.tree.leaves(states[1].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    for a, b in zip(jax.tree.leaves(states[2].params), jax.tree.leaves(states[3].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_lane_gather_matches_row_gather(rng):
    """gather_neighbors_lane([C,N] node-minor) must equal the row gather's
    transpose in forward AND backward (its cotangent is a lane gather too)."""
    from facet_graph_convolution_tpu.graph.convert import lane_tables
    from facet_graph_convolution_tpu.ops.gather import gather_neighbors_lane

    adj = random_klist(rng)
    n, k = adj.shape
    adjT, adjT_t = lane_tables(adj)
    assert adjT.shape == (k, n)
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(5, k, n)).astype(np.float32))

    y_row = gather_neighbors(x, jnp.asarray(adj))            # [N, K, C]
    y_lane = gather_neighbors_lane(
        x.T, jnp.asarray(adjT), jnp.asarray(adjT_t)          # [C, K, N]
    )
    np.testing.assert_allclose(
        np.asarray(y_lane), np.asarray(jnp.transpose(y_row, (2, 1, 0)))
    )

    def f_row(x):
        return jnp.sum(gather_neighbors(x, jnp.asarray(adj))
                       * jnp.transpose(cot, (2, 1, 0)))

    def f_lane(x):
        return jnp.sum(
            gather_neighbors_lane(x.T, jnp.asarray(adjT), jnp.asarray(adjT_t))
            * cot
        )

    g_row = jax.jit(jax.grad(f_row))(x)
    g_lane = jax.jit(jax.grad(f_lane))(x)
    np.testing.assert_allclose(np.asarray(g_lane), np.asarray(g_row), atol=1e-5)


def test_lane_pre_gather_matches_lane(rng):
    """gather_neighbors_lane_pre (pre-derived clamp/mask tables,
    graph.convert.lane_tables_pre) must be bit-identical to the in-graph
    forms in forward AND backward — masked (zero-padding) and clamped."""
    from facet_graph_convolution_tpu.graph.convert import (
        lane_tables,
        lane_tables_pre,
    )
    from facet_graph_convolution_tpu.ops.gather import (
        gather_neighbors_lane,
        gather_neighbors_lane_pre,
    )

    adj = random_klist(rng)
    n, k = adj.shape
    adjT, adjT_t = lane_tables(adj)
    adjT0, validF, idxT, validT = lane_tables_pre(adj)
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(5, k, n)).astype(np.float32))

    # masked (zero-padding) semantics
    y_lane = gather_neighbors_lane(x.T, jnp.asarray(adjT), jnp.asarray(adjT_t))
    y_pre = gather_neighbors_lane_pre(
        x.T, jnp.asarray(adjT0), jnp.asarray(idxT), jnp.asarray(validT),
        validF=jnp.asarray(validF),
    )
    np.testing.assert_array_equal(np.asarray(y_pre), np.asarray(y_lane))

    # clamped semantics (consumer must zero padding itself)
    y_cl = gather_neighbors_lane(x.T, jnp.asarray(adjT), jnp.asarray(adjT_t),
                                 clamped=True)
    y_pre_cl = gather_neighbors_lane_pre(
        x.T, jnp.asarray(adjT0), jnp.asarray(idxT), jnp.asarray(validT)
    )
    np.testing.assert_array_equal(np.asarray(y_pre_cl), np.asarray(y_cl))

    def f_lane(x):
        return jnp.sum(
            gather_neighbors_lane(x.T, jnp.asarray(adjT), jnp.asarray(adjT_t))
            * cot
        )

    def f_pre(x):
        return jnp.sum(
            gather_neighbors_lane_pre(
                x.T, jnp.asarray(adjT0), jnp.asarray(idxT),
                jnp.asarray(validT), validF=jnp.asarray(validF),
            ) * cot
        )

    g_lane = jax.jit(jax.grad(f_lane))(x)
    g_pre = jax.jit(jax.grad(f_pre))(x)
    np.testing.assert_allclose(np.asarray(g_pre), np.asarray(g_lane), atol=1e-6)


def test_patch_arrays_lane_pre_step_parity(rng):
    """A full train step on the lane='pre' graph form matches the default
    lane form exactly (loss and updated params) — the form the DP bank and
    scanned multi-patch trainers stage."""
    import optax

    from facet_graph_convolution_tpu.config import default_config
    from facet_graph_convolution_tpu.data.dataset import TrainingSet
    from facet_graph_convolution_tpu.training.trainer import (
        _patch_arrays,
        create_train_state,
        make_normals_train_step,
    )
    from tests.conftest import make_icosphere

    v, f = make_icosphere(2)
    noisy = (v + rng.normal(scale=0.02, size=v.shape)).astype(np.float32)
    ds = TrainingSet(max_patch_size=10**9, coarsening_steps=2,
                     coarsening_levels=3, k_faces=23, seed=0)
    ds.add_mesh(noisy, f, gt_vertices=v)

    cfg = default_config().replace(
        model={"channels": (8, 16, 32), "num_filters": 4, "fc_channels": 32},
        train={"loss_samples": 256},
    )
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_normals_train_step(tx, cfg)
    key = jax.random.PRNGKey(7)

    out = {}
    for mode in (True, "pre"):
        x, adjs, gt, adj_ts, mults = _patch_arrays(ds.patches[0], lane=mode)
        s, loss = step(state, x, adjs, gt, key, adj_ts, mults)
        out[mode] = (float(loss), s.params)
    assert out[True][0] == out["pre"][0]
    for name in out[True][1]:
        for leaf in out[True][1][name]:
            np.testing.assert_array_equal(
                np.asarray(out["pre"][1][name][leaf]),
                np.asarray(out[True][1][name][leaf]), err_msg=f"{name}/{leaf}",
            )
