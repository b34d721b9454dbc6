"""Serving path: batched inference server and AOT export."""

import jax
import jax.numpy as jnp
import numpy as np

from facet_graph_convolution_tpu.config import default_config
from facet_graph_convolution_tpu.data.synthetic import add_vertex_noise, icosphere
from facet_graph_convolution_tpu.inference.serving import (
    InferenceServer,
    export_forward,
    load_forward,
)
from facet_graph_convolution_tpu.training.trainer import create_train_state


def _cfg():
    return default_config().replace(
        data={"max_patch_size": 20000}, eval={"solver_iterations": 5}
    )


def _meshes():
    rng = np.random.default_rng(0)
    v, f = icosphere(2)
    v2, f2 = icosphere(3)
    return [
        (add_vertex_noise(v, f, 0.1, rng), f),
        (add_vertex_noise(v2, f2, 0.1, rng), f2),
    ]


def test_server_batch_matches_single():
    cfg = _cfg()
    state, _ = create_train_state(jax.random.PRNGKey(0), cfg)
    server = InferenceServer(cfg, params=state.params, bucket_align=256)
    meshes = _meshes()

    batch_out = server.denoise_batch(meshes)
    assert len(batch_out) == 2
    for (v, f), (refined, normals) in zip(meshes, batch_out):
        assert refined.shape == v.shape
        assert normals.shape == (f.shape[0], 3)
        np.testing.assert_allclose(
            np.linalg.norm(normals, axis=1), 1.0, atol=1e-4
        )

    single = server.denoise(*meshes[0])
    np.testing.assert_allclose(single[0], batch_out[0][0], atol=1e-4)
    np.testing.assert_allclose(single[1], batch_out[0][1], atol=1e-4)
    # the executable cache is keyed by (batch, shapes): 2 entries expected
    assert len(server._compiled) == 2

    # served vertices must match the inference DRIVER for the same
    # config/params — the solver options (lambda mode, adaptive stop,
    # trust cap) ride the same config (round-5 regression: serving kept
    # the old fixed-schedule solver)
    from facet_graph_convolution_tpu.data.dataset import InferenceMesh
    from facet_graph_convolution_tpu.inference.driver import infer_normals

    mesh = InferenceMesh(
        max_patch_size=cfg.data.max_patch_size,
        coarsening_steps=cfg.model.coarsening_steps,
        coarsening_levels=cfg.model.coarsening_levels,
        k_faces=cfg.data.k_faces, seed=0,
    )
    mesh.add_mesh(*meshes[0])
    drv_refined, drv_normals = infer_normals(mesh, cfg, params=state.params)
    np.testing.assert_allclose(batch_out[0][1], drv_normals, atol=1e-4)
    np.testing.assert_allclose(batch_out[0][0], drv_refined, atol=1e-4)


def test_server_compiled_cache_lru_bounded():
    """A long-lived server over many distinct bucket shapes must hold at most
    ``max_compiled`` executables (LRU eviction), and an evicted shape must
    still serve correctly on re-request (recompile)."""
    cfg = _cfg()
    state, _ = create_train_state(jax.random.PRNGKey(0), cfg)
    server = InferenceServer(cfg, params=state.params, bucket_align=16,
                             max_compiled=3)
    rng = np.random.default_rng(1)
    v, f = icosphere(2)
    noisy = add_vertex_noise(v, f, 0.1, rng)

    # distinct batch sizes give distinct cache keys with one mesh topology
    first = server.denoise_batch([(noisy, f)])
    for b in (2, 3, 4, 5):
        server.denoise_batch([(noisy, f)] * b)
        assert len(server._compiled) <= 3
    assert len(server._compiled) == 3
    # batch=1 was evicted (LRU); re-request recompiles and matches
    again = server.denoise_batch([(noisy, f)])
    np.testing.assert_allclose(again[0][0], first[0][0], atol=1e-5)
    np.testing.assert_allclose(again[0][1], first[0][1], atol=1e-5)
    assert len(server._compiled) == 3


def test_export_roundtrip(tmp_path):
    cfg = _cfg()
    state, _ = create_train_state(jax.random.PRNGKey(0), cfg)
    server = InferenceServer(cfg, params=state.params, bucket_align=256)
    meshes = _meshes()[:1]

    # drive once through the server to get a bucketed patch for comparison
    from facet_graph_convolution_tpu.data.dataset import bucket_size, pad_patch_to
    from facet_graph_convolution_tpu.inference.serving import _build_mesh

    mesh = _build_mesh(*meshes[0], cfg)
    patch = pad_patch_to(mesh.patches[0], bucket_size(mesh.patches[0].num_nodes, 256))
    n = patch.num_nodes
    widths = [a.shape[1] for a in patch.adjs]

    # baked mode: a self-contained artifact with weights as constants
    data = export_forward(cfg, state.params, n, widths, batch=1,
                          bake_params=True)
    assert isinstance(data, (bytes, bytearray)) and len(data) > 1000
    path = tmp_path / "forward.jaxexport"
    path.write_bytes(data)

    fn = load_forward(path.read_bytes())
    x = jnp.asarray(patch.inputs)[None]
    adjs = [jnp.asarray(a)[None] for a in patch.adjs]
    y = np.asarray(fn(x, *adjs))[0]
    assert y.shape == (n, 3)

    # must match the in-process forward exactly
    from facet_graph_convolution_tpu.models.unet import unet_apply
    from facet_graph_convolution_tpu.ops.normalization import normalize_tensor

    y_ref = np.asarray(
        normalize_tensor(
            unet_apply(state.params, jnp.asarray(patch.inputs),
                       tuple(jnp.asarray(a) for a in patch.adjs),
                       coarsening_steps=cfg.model.coarsening_steps)
        )
    )
    np.testing.assert_allclose(y, y_ref, atol=1e-5)


def test_server_with_vertices_matches_driver():
    """Batched with-vertices serving reproduces infer_with_vertices (the
    per-mesh driver) to float tolerance."""
    from facet_graph_convolution_tpu.data.dataset import InferenceMesh
    from facet_graph_convolution_tpu.inference.driver import infer_with_vertices

    cfg = _cfg().replace(eval={"ms_solver_iterations": (8, 2, 2)})
    state, _ = create_train_state(jax.random.PRNGKey(0), cfg, multi_scale=True)
    server = InferenceServer(cfg, params=state.params, bucket_align=256,
                             include_vertices=True)
    meshes = _meshes()
    out = server.denoise_batch(meshes)
    assert len(out) == 2
    for (v, f), res in zip(meshes, out):
        assert res["points"].shape == v.shape
        assert res["fine_normals"].shape == (f.shape[0], 3)

    mesh = InferenceMesh(
        max_patch_size=cfg.data.max_patch_size,
        coarsening_steps=cfg.model.coarsening_steps,
        coarsening_levels=cfg.model.coarsening_levels,
        k_faces=cfg.data.k_faces,
        min_patch_size=cfg.data.min_patch_size,
        seed=0,                       # match the server's coarsening seed
    )
    mesh.add_mesh_with_vertices(*meshes[0])
    ref = infer_with_vertices(mesh, cfg, params=state.params)
    for key in ("points", "points_mid", "points_coarse", "fine_normals"):
        np.testing.assert_allclose(out[0][key], ref[key], atol=2e-4,
                                   err_msg=key)


def test_export_params_as_arguments(tmp_path):
    """Default export takes params as a call argument: a new checkpoint
    swaps in without re-exporting."""
    cfg = _cfg()
    state, _ = create_train_state(jax.random.PRNGKey(0), cfg)
    data = export_forward(cfg, state.params, num_nodes=256,
                          adj_widths=(23, 23, 23))
    fn = load_forward(data)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 256, 6)).astype(np.float32)
    adj0 = np.zeros((1, 256, 23), np.int32)
    adj0[0, :, 0] = np.arange(256) + 1
    adj1 = np.zeros((1, 64, 23), np.int32)
    adj1[0, :, 0] = np.arange(64) + 1
    adj2 = np.zeros((1, 16, 23), np.int32)
    adj2[0, :, 0] = np.arange(16) + 1

    y1 = np.asarray(fn(state.params, x, adj0, adj1, adj2))
    # swap in different params WITHOUT re-exporting
    params2 = jax.tree.map(lambda w: w * 1.5, state.params)
    y2 = np.asarray(fn(params2, x, adj0, adj1, adj2))
    assert y1.shape == (1, 256, 3)
    assert not np.allclose(y1, y2)

    # oracle: direct forward with the swapped params
    from facet_graph_convolution_tpu.models.unet import unet_apply
    from facet_graph_convolution_tpu.ops.normalization import normalize_tensor

    ref = normalize_tensor(unet_apply(
        params2, jnp.asarray(x[0]),
        (jnp.asarray(adj0[0]), jnp.asarray(adj1[0]), jnp.asarray(adj2[0])),
    ))
    np.testing.assert_allclose(y2[0], np.asarray(ref), atol=1e-5)


def test_export_multiscale_heads(tmp_path):
    cfg = _cfg()
    state, _ = create_train_state(jax.random.PRNGKey(0), cfg, multi_scale=True)
    data = export_forward(cfg, state.params, num_nodes=256,
                          adj_widths=(23, 23, 23), multi_scale=True)
    fn = load_forward(data)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 256, 6)).astype(np.float32)
    adj0 = np.zeros((1, 256, 23), np.int32); adj0[0, :, 0] = np.arange(256) + 1
    adj1 = np.zeros((1, 64, 23), np.int32); adj1[0, :, 0] = np.arange(64) + 1
    adj2 = np.zeros((1, 16, 23), np.int32); adj2[0, :, 0] = np.arange(16) + 1
    y0, y1, y2 = fn(state.params, x, adj0, adj1, adj2)
    assert np.asarray(y0).shape == (1, 256, 3)
    assert np.asarray(y1).shape == (1, 64, 3)
    assert np.asarray(y2).shape == (1, 16, 3)
