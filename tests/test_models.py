"""U-Net and loss tests."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facet_graph_convolution_tpu.models import (
    face_normals_loss,
    full_chamfer_loss,
    init_unet,
    random_rotation,
    rotate_inputs,
    sampled_accuracy_loss,
    unet_apply,
)


def make_pyramid_graph(rng, n0=64, k=9):
    """Random K-list pyramid with N, N/4, N/16 nodes."""
    adjs = []
    n = n0
    for _ in range(3):
        adj = np.zeros((n, k), dtype=np.int32)
        adj[:, 0] = np.arange(n) + 1
        for i in range(n):
            deg = rng.integers(1, min(k - 1, n))
            adj[i, 1 : 1 + deg] = rng.choice(n, size=deg, replace=False) + 1
        adjs.append(jnp.asarray(adj))
        n //= 4
    return adjs


def test_unet_shapes_and_grads(rng):
    adjs = make_pyramid_graph(rng)
    x = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32))
    params = init_unet(jax.random.PRNGKey(0), in_channels=6)

    @jax.jit
    def forward(params, x):
        return unet_apply(params, x, adjs)

    y = forward(params, x)
    assert y.shape == (64, 3)
    assert np.all(np.isfinite(np.asarray(y)))

    @jax.jit
    def loss_fn(params, x):
        return jnp.sum(unet_apply(params, x, adjs) ** 2)

    grads = jax.jit(jax.grad(loss_fn))(params, x)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(np.any(np.asarray(g) != 0) for g in flat)


def test_unet_multiscale_heads(rng):
    adjs = make_pyramid_graph(rng)
    x = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32))
    params = init_unet(jax.random.PRNGKey(0), in_channels=6, multi_scale=True)

    @jax.jit
    def forward(params, x):
        return unet_apply(params, x, adjs, multi_scale=True)

    y0, y1, y2 = forward(params, x)
    assert y0.shape == (64, 3)
    assert y1.shape == (16, 3)
    assert y2.shape == (4, 3)


def test_face_normals_loss_oracle():
    # two normals 60° apart + one fake node
    a = np.array([[1, 0, 0], [0, 1, 0], [0.5, 0.5, 0.1]], np.float32)
    b = np.array(
        [[np.cos(np.pi / 3), np.sin(np.pi / 3), 0], [0, 1, 0], [0, 0, 0]], np.float32
    )
    loss = float(face_normals_loss(jnp.asarray(a), jnp.asarray(b)))
    # fake node (zero GT) excluded: mean of (60°, 0°). The acos clamp at
    # 0.9999999 (train.py:1278-1279) makes a perfect match read ≈0.0256°,
    # so the mean carries a ≈0.013° bias — reference behavior.
    np.testing.assert_allclose(loss, 30.0, atol=0.02)


def test_face_normals_loss_clamp_stability():
    n = np.array([[0, 0, 1.0]], np.float32)
    loss = face_normals_loss(jnp.asarray(n), jnp.asarray(n))
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: face_normals_loss(p, jnp.asarray(n)))(jnp.asarray(n))
    assert np.all(np.isfinite(np.asarray(g)))


def test_chamfer_losses(rng):
    p = rng.normal(size=(50, 3)).astype(np.float32)
    idx = jnp.arange(10)
    zero = float(full_chamfer_loss(jnp.asarray(p), jnp.asarray(p), idx, idx))
    np.testing.assert_allclose(zero, 0.0, atol=1e-4)
    shifted = p + 0.1
    val = float(full_chamfer_loss(jnp.asarray(p), jnp.asarray(shifted), idx, idx))
    assert val > 0
    sym = float(sampled_accuracy_loss(jnp.asarray(p), jnp.asarray(p)))
    np.testing.assert_allclose(sym, 0.0, atol=1e-4)


def test_rotation_augmentation(rng):
    key = jax.random.PRNGKey(7)
    rot = random_rotation(key)
    r = np.asarray(rot)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)

    x6 = rng.normal(size=(20, 6)).astype(np.float32)
    out = np.asarray(rotate_inputs(rot, jnp.asarray(x6)))
    np.testing.assert_allclose(out[:, :3], x6[:, :3] @ r.T, atol=1e-5)
    np.testing.assert_allclose(out[:, 3:], x6[:, 3:] @ r.T, atol=1e-5)

    x7 = rng.normal(size=(20, 7)).astype(np.float32)
    out7 = np.asarray(rotate_inputs(rot, jnp.asarray(x7)))
    np.testing.assert_allclose(out7[:, 3], x7[:, 3], atol=1e-6)  # border ch fixed

    # rotating inputs and GT together leaves the angular loss unchanged
    n = rng.normal(size=(20, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    gt = np.roll(n, 1, axis=0)
    l0 = float(face_normals_loss(jnp.asarray(n), jnp.asarray(gt)))
    l1 = float(
        face_normals_loss(
            rotate_inputs(rot, jnp.asarray(n)), rotate_inputs(rot, jnp.asarray(gt))
        )
    )
    np.testing.assert_allclose(l0, l1, rtol=1e-4)
