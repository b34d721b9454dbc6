"""Variant × execution-path matrix (VERDICT round-1 weak item 3).

Reference semantics: rotation invariance applies to the FIRST conv only
(model.py:858 passes ``rotation_invariance=bRotInvariant``; every other conv
passes False), translation invariance to every conv. Every execution path —
row-major, self-split fast path, node-minor, lane, sharded — must agree for
every variant; the Pallas backend fails loudly for rotation invariance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facet_graph_convolution_tpu.config import default_config
from facet_graph_convolution_tpu.models.unet import init_unet, unet_apply, unet_apply_nminor
from facet_graph_convolution_tpu.ops.conv import (
    FacetConvVariant,
    facet_conv,
    facet_conv_nminor,
    init_facet_conv,
    per_conv_variants,
)
from tests.test_models import make_pyramid_graph


def _ri_conv_inputs(rng, n=48, k=9, in_ch=6):
    adj = np.zeros((n, k), np.int32)
    adj[:, 0] = np.arange(n) + 1
    for i in range(n):
        deg = int(rng.integers(1, k - 1))
        adj[i, 1 : 1 + deg] = rng.choice(n, size=deg, replace=True) + 1
    x = rng.normal(size=(n, in_ch)).astype(np.float32)
    x[:, :3] /= np.linalg.norm(x[:, :3], axis=1, keepdims=True)
    return adj, x


def test_per_conv_variants_reference_semantics():
    assert per_conv_variants(FacetConvVariant.DEFAULT) == (
        FacetConvVariant.DEFAULT, FacetConvVariant.DEFAULT)
    assert per_conv_variants(FacetConvVariant.TRANSLATION_INVARIANT) == (
        FacetConvVariant.TRANSLATION_INVARIANT,
        FacetConvVariant.TRANSLATION_INVARIANT)
    assert per_conv_variants(FacetConvVariant.ROTATION_INVARIANT) == (
        FacetConvVariant.ROTATION_INVARIANT, FacetConvVariant.DEFAULT)


def test_rotinv_conv_all_paths_match(rng):
    """RI conv: raw row-major == self-split row-major == node-minor ==
    lane — values AND parameter gradients."""
    from facet_graph_convolution_tpu.graph.convert import (
        dedupe_klist,
        fused_mult_rows,
        lane_tables,
        split_self_klist,
        transpose_adjacency,
    )

    adj, x = _ri_conv_inputs(rng)
    params = init_facet_conv(
        jax.random.PRNGKey(0), 6, 8, 4,
        variant=FacetConvVariant.ROTATION_INVARIANT,
    )
    a_u, mult = dedupe_klist(adj)
    nbr, m_n, s_m = split_self_klist(a_u, mult)
    nbr_t = transpose_adjacency(nbr)
    rows = fused_mult_rows(m_n, s_m)
    adjT, adjT_t = lane_tables(nbr)

    def loss(fn):
        return lambda p: jnp.sum(fn(p) ** 2)

    ri = FacetConvVariant.ROTATION_INVARIANT
    f_raw = lambda p: facet_conv(p, jnp.asarray(x), jnp.asarray(adj), variant=ri)
    f_split = lambda p: facet_conv(
        p, jnp.asarray(x), jnp.asarray(nbr), variant=ri,
        adj_t=jnp.asarray(nbr_t), mult=(jnp.asarray(m_n), jnp.asarray(s_m)),
    )
    f_nm = lambda p: facet_conv_nminor(
        p, jnp.asarray(x).T, jnp.asarray(nbr), jnp.asarray(nbr_t),
        jnp.asarray(rows), variant=ri,
    ).T
    f_lane = lambda p: facet_conv_nminor(
        p, jnp.asarray(x).T, jnp.asarray(adjT), jnp.asarray(adjT_t),
        jnp.asarray(rows), variant=ri, lane=True,
    ).T

    y_raw = jax.jit(f_raw)(params)
    for fn in (f_split, f_nm, f_lane):
        np.testing.assert_allclose(
            np.asarray(jax.jit(fn)(params)), np.asarray(y_raw), atol=2e-5
        )
        g_ref = jax.grad(loss(f_raw))(params)
        g = jax.grad(loss(fn))(params)
        for k in g_ref:
            np.testing.assert_allclose(np.asarray(g[k]), np.asarray(g_ref[k]),
                                       atol=5e-4, rtol=5e-4, err_msg=k)


def test_rotinv_unet_rowmajor_matches_nminor(rng):
    """Full U-Net with rotation_invariance: conv1 RI + rest default, equal
    across the row-major and node-minor/lane fast paths."""
    from facet_graph_convolution_tpu.training.trainer import _graph_arrays

    adjs = make_pyramid_graph(rng)
    x = rng.normal(size=(64, 6)).astype(np.float32)
    x[:, :3] /= np.linalg.norm(x[:, :3], axis=1, keepdims=True)
    x = jnp.asarray(x)
    ri = FacetConvVariant.ROTATION_INVARIANT
    params = init_unet(jax.random.PRNGKey(0), in_channels=6,
                       channels=(8, 16, 32), num_filters=4, fc_channels=32,
                       variant=ri)
    assert "v" not in params["conv1"]          # RI conv1 has no v
    assert "v" in params["conv2"]              # remaining convs are default

    y_row = jax.jit(lambda p: unet_apply(p, x, adjs, variant=ri))(params)

    adjs_o, adj_ts, mults = _graph_arrays([np.asarray(a) for a in adjs], lane=False)
    rows = [m["rows"] for m in mults]
    y_nm = jax.jit(lambda p: unet_apply_nminor(p, x, adjs_o, adj_ts, rows,
                                               variant=ri))(params)
    np.testing.assert_allclose(np.asarray(y_nm), np.asarray(y_row), atol=3e-5)

    adjs_l, adj_ts_l, mults_l = _graph_arrays([np.asarray(a) for a in adjs])
    rows_l = [m["rows_lane"] for m in mults_l]
    y_lane = jax.jit(lambda p: unet_apply_nminor(p, x, adjs_l, adj_ts_l, rows_l,
                                                 variant=ri, lane=True))(params)
    np.testing.assert_allclose(np.asarray(y_lane), np.asarray(y_row), atol=3e-5)


def test_rotinv_sharded_matches_single_device(rng):
    """RI forward on the 8-device halo mesh equals the single-device RI
    forward (both layouts)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from facet_graph_convolution_tpu.data.dataset import TrainingSet, bucket_size, pad_patch_to
    from facet_graph_convolution_tpu.ops.normalization import normalize_tensor
    from facet_graph_convolution_tpu.parallel.halo import build_partition, sharded_unet_apply
    from facet_graph_convolution_tpu.parallel.mesh import make_mesh
    from tests.conftest import make_icosphere

    v, f = make_icosphere(2)
    ds = TrainingSet(max_patch_size=10**9, coarsening_steps=2,
                     coarsening_levels=3, k_faces=23, seed=0)
    ds.add_mesh(v, f, gt_vertices=v)
    patch = pad_patch_to(ds.patches[0], bucket_size(ds.patches[0].num_nodes, 16 * 8))

    ri = FacetConvVariant.ROTATION_INVARIANT
    params = init_unet(jax.random.PRNGKey(0), in_channels=6,
                       channels=(8, 16, 32), num_filters=4, fc_channels=32,
                       variant=ri)
    x = jnp.asarray(patch.inputs)
    ref = normalize_tensor(
        jax.jit(lambda p: unet_apply(p, x, tuple(jnp.asarray(a) for a in patch.adjs),
                                     variant=ri))(params)
    )
    mesh = make_mesh((1, 8), ("data", "graph"))
    part = build_partition(patch.adjs, 8)
    with mesh:
        out_nm = sharded_unet_apply(params, x, part, mesh, variant=ri)
        out_rm = sharded_unet_apply(params, x, part, mesh, variant=ri,
                                    layout="rowmajor")
    np.testing.assert_allclose(np.asarray(out_nm), np.asarray(ref), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_rm), np.asarray(ref), atol=5e-5)


def test_rotinv_trainer_step_runs(rng):
    """cfg.model.rotation_invariance drives the default fast path end to
    end (train step + eval step), no silent fallback, loss finite."""
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
        model={"channels": (8, 16, 32), "num_filters": 4, "fc_channels": 32,
               "rotation_invariance": True},
        train={"loss_samples": 256},
    )
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    assert "v" not in state.params["conv1"]
    step = make_normals_train_step(tx, cfg)
    x, adjs, gt, adj_ts, mults = _patch_arrays(ds.patches[0])
    state, loss = step(state, x, adjs, gt, jax.random.PRNGKey(1), adj_ts, mults)
    assert np.isfinite(float(loss))


def test_bf16_nminor_matches_rowmajor_bounded(rng):
    """Under compute_dtype=bfloat16 the nminor path's `_aggregate_nminor`
    rounds per-slot products to bf16 before the f32-accumulated sum, while
    the row-major dot_general keeps exact bf16×bf16 products (ops/conv.py).
    This test bounds that accepted numerics drift — values AND parameter
    gradients — so a future regression in the rounding is caught."""
    from facet_graph_convolution_tpu.training.trainer import _graph_arrays

    adjs = make_pyramid_graph(rng)
    x = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32))
    params = init_unet(jax.random.PRNGKey(0), in_channels=6,
                       channels=(8, 16, 32), num_filters=4, fc_channels=32)

    f_row = lambda p: unet_apply(p, x, adjs, compute_dtype=jnp.bfloat16)
    adjs_l, adj_ts_l, mults_l = _graph_arrays([np.asarray(a) for a in adjs])
    rows_l = [m["rows_lane"] for m in mults_l]
    f_lane = lambda p: unet_apply_nminor(p, x, adjs_l, adj_ts_l, rows_l,
                                         compute_dtype=jnp.bfloat16, lane=True)

    y_row = np.asarray(jax.jit(f_row)(params))
    y_lane = np.asarray(jax.jit(f_lane)(params))
    scale = np.abs(y_row).max()
    assert np.abs(y_lane - y_row).max() <= 0.03 * scale

    g_row = jax.grad(lambda p: jnp.sum(f_row(p) ** 2))(params)
    g_lane = jax.grad(lambda p: jnp.sum(f_lane(p) ** 2))(params)
    for name in g_row:
        for leaf in g_row[name]:
            a = np.asarray(g_row[name][leaf])
            b = np.asarray(g_lane[name][leaf])
            denom = max(np.abs(a).max(), 1e-3)
            assert np.abs(b - a).max() <= 0.05 * denom, (name, leaf)


def test_rotinv_pallas_fails_loudly(rng):
    from facet_graph_convolution_tpu.models.unet import unet_apply_pallas

    params = init_unet(jax.random.PRNGKey(0), in_channels=6,
                       channels=(8, 16, 32), num_filters=4, fc_channels=32,
                       variant=FacetConvVariant.ROTATION_INVARIANT)
    with pytest.raises(NotImplementedError, match="node-minor"):
        unet_apply_pallas(params, None, [None], [None], [None],
                          variant=FacetConvVariant.ROTATION_INVARIANT)
