"""Activation parity harness self-tests: capture matches unet_apply, export
roundtrip compares clean, perturbation is caught."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facet_graph_convolution_tpu.evaluation.parity import (
    capture_activations,
    compare_activations,
    export_activations,
)
from facet_graph_convolution_tpu.models.unet import init_unet, unet_apply
from tests.test_models import make_pyramid_graph


def test_capture_matches_unet(rng):
    adjs = make_pyramid_graph(rng)
    x = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32))
    params = init_unet(jax.random.PRNGKey(0), in_channels=6,
                       channels=(8, 16, 32), num_filters=4, fc_channels=32)
    acts = capture_activations(params, x, adjs)
    y = np.asarray(jax.jit(unet_apply)(params, x, adjs))
    np.testing.assert_allclose(acts["out0"], y, atol=1e-5)
    assert set(acts) >= {"conv1", "pool1", "conv2", "conv3", "dconv3",
                         "upconv2", "dconv2", "upconv1", "dconv1", "fc1", "out0"}


def test_export_compare_roundtrip(tmp_path, rng):
    adjs = make_pyramid_graph(rng)
    x = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32))
    params = init_unet(jax.random.PRNGKey(0), in_channels=6,
                       channels=(8, 16, 32), num_filters=4, fc_channels=32)
    a = str(tmp_path / "a.npz")
    b = str(tmp_path / "b.npz")
    export_activations(a, params, x, adjs)
    export_activations(b, params, x, adjs)
    report = compare_activations(a, b)
    assert max(report.values()) == 0.0

    # a perturbed network must be flagged with the offending layer named
    params2 = jax.tree_util.tree_map(lambda w: w * 1.01, params)
    c = str(tmp_path / "c.npz")
    export_activations(c, params2, x, adjs)
    with pytest.raises(AssertionError, match="conv1"):
        compare_activations(a, c)
