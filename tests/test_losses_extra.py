"""Coverage for the remaining loss/op variants."""

import jax
import jax.numpy as jnp
import numpy as np

from facet_graph_convolution_tpu.geometry import compute_face_normals, edge_map
from facet_graph_convolution_tpu.models.losses import (
    accuracy_loss,
    charbonnier_face_normals_loss,
)
from facet_graph_convolution_tpu.models.augment import random_rotation, rotate_inputs
from facet_graph_convolution_tpu.ops.normalization import init_moments_norm, moments_norm
from facet_graph_convolution_tpu.ops.vertex_update import update_positions_depth
from tests.conftest import make_cube


def test_charbonnier_loss_finite_and_positive(rng):
    n = rng.normal(size=(20, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    gt = np.roll(n, 1, axis=0)
    val = float(charbonnier_face_normals_loss(jnp.asarray(n), jnp.asarray(gt)))
    assert np.isfinite(val) and val > 0
    same = float(charbonnier_face_normals_loss(jnp.asarray(n), jnp.asarray(n)))
    assert same < val


def test_accuracy_loss(rng):
    p = rng.normal(size=(30, 3)).astype(np.float32)
    # completeness runs against the SAMPLED subset only (train.py:1356-1358),
    # so the zero check needs the full index set
    full = jnp.arange(30)
    zero = float(accuracy_loss(jnp.asarray(p), jnp.asarray(p), full))
    np.testing.assert_allclose(zero, 0.0, atol=1e-4)
    val = float(accuracy_loss(jnp.asarray(p), jnp.asarray(p + 0.1), full))
    assert val > 0
    # partial sampling leaves unsampled p1 points with positive completeness
    partial = float(accuracy_loss(jnp.asarray(p), jnp.asarray(p), jnp.arange(10)))
    assert partial > 0


def test_moments_norm(rng):
    params = init_moments_norm(jax.random.PRNGKey(0), 4)
    x = rng.normal(loc=3.0, scale=2.0, size=(100, 4)).astype(np.float32)
    out = np.asarray(moments_norm(params, jnp.asarray(x)))
    # (x - mean)/std scaled by gamma + beta: recover standardization
    gamma = np.asarray(params["gamma"])
    beta = np.asarray(params["beta"])
    std = (out - beta) / gamma
    np.testing.assert_allclose(std.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(std.std(axis=0), 1.0, atol=1e-2)


def test_update_positions_depth(rng):
    v, f = make_cube()
    normals = compute_face_normals(v, f)
    e_map, v_e_map = edge_map(f, max_edges=20)
    noisy = (v + rng.normal(scale=0.05, size=v.shape)).astype(np.float32)
    depth = jnp.asarray(np.array([0.0, 0.0, 1.0], np.float32))
    out, disp = update_positions_depth(
        jnp.asarray(noisy), jnp.asarray(normals), jnp.asarray(e_map),
        jnp.asarray(v_e_map), depth, iter_num=10,
    )
    out, disp = np.asarray(out), np.asarray(disp)
    assert np.all(np.isfinite(out))
    # displacement happens only along the depth direction
    np.testing.assert_allclose(disp[:, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(disp[:, 1], 0.0, atol=1e-6)
    assert np.any(np.abs(disp[:, 2]) > 1e-6)


def test_rotate_inputs_eight_channels(rng):
    key = jax.random.PRNGKey(3)
    rot = random_rotation(key)
    r = np.asarray(rot)
    x8 = rng.normal(size=(10, 8)).astype(np.float32)
    out = np.asarray(rotate_inputs(rot, jnp.asarray(x8)))
    np.testing.assert_allclose(out[:, :3], x8[:, :3] @ r.T, atol=1e-5)
    np.testing.assert_allclose(out[:, 3:5], x8[:, 3:5], atol=1e-6)
    np.testing.assert_allclose(out[:, 5:], x8[:, 5:] @ r.T, atol=1e-5)


def test_chamfer_grad_finite_at_coincident_points(rng):
    """The chamfer backward must stay finite when a refined point lands
    EXACTLY on a GT point: jnp.linalg.norm's gradient is diff/dist = 0/0
    there, and the resulting NaN reaches every parameter through the
    min-reduction's unselected branches (losses.py:_pairwise_dist)."""
    from facet_graph_convolution_tpu.models.losses import full_chamfer_loss

    p1 = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
    p0 = p1.at[3].set(p1[7])  # p0[3] coincides exactly with p1[7]
    p0 = p0 + 0.0
    idx = jnp.arange(10)

    def loss(p0):
        return full_chamfer_loss(p0, p1, idx, idx)

    g = jax.grad(loss)(p0)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_chamfer_threshold_is_nan_transparent():
    """A NaN-poisoned prediction must surface as a NaN loss so driver
    NaN-abort guards fire; the reference's where(dist <= thr, dist, 0)
    maps NaN to 0.0 and training collapses silently
    (losses.py:_threshold)."""
    from facet_graph_convolution_tpu.models.losses import (
        accuracy_loss,
        full_chamfer_loss,
        sampled_accuracy_loss,
    )

    p1 = jnp.asarray(np.random.default_rng(0).normal(size=(12, 3)).astype(np.float32))
    p0 = jnp.full((12, 3), jnp.nan, dtype=jnp.float32)
    idx = jnp.arange(6)
    assert bool(jnp.isnan(full_chamfer_loss(p0, p1, idx, idx)))
    assert bool(jnp.isnan(accuracy_loss(p0, p1, idx)))
    assert bool(jnp.isnan(sampled_accuracy_loss(p0, p1)))
