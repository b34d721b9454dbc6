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

    data = export_forward(cfg, state.params, n, widths, batch=1)
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
