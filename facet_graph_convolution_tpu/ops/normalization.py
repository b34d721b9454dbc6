"""Normalization and activation primitives.

Parity targets: ``normalizeTensor`` (utils.py:1700-1715), ``tensorDotProduct``
(utils.py:37-41), ``lrelu`` (model.py:828-830), ``batch_norm``
(model.py:408-424).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def dot_last(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sum-product over the last axis (reference ``tensorDotProduct``)."""
    return jnp.sum(x * y, axis=-1)


def normalize_tensor(x: jnp.ndarray, epsilon: float = 1e-5) -> jnp.ndarray:
    """Mean-abs prescale followed by safe L2 normalization, matching the
    reference's exact sequence (utils.py:1700-1715):

    1. ``x ← x / (mean|x| + ε)`` — a global prescale that keeps the following
       sqrt well-conditioned for tiny network outputs;
    2. ``x ← x / sqrt(ε + Σ x²)`` where rows with norm ≤ ε map to zero.
    """
    mean_val = jnp.mean(jnp.abs(x))
    x = x / (mean_val + epsilon)
    norm = jnp.sqrt(epsilon + jnp.sum(jnp.square(x), axis=-1))
    inv = jnp.where(norm > epsilon, 1.0 / (norm + epsilon), 0.0)
    return x * inv[..., None]


def lrelu(x: jnp.ndarray, alpha: float = 0.1) -> jnp.ndarray:
    """Leaky ReLU expressed like the reference (model.py:828-830)."""
    return jax.nn.relu(x) - alpha * jax.nn.relu(-x)


def face_normals_device(points: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Device-side facet normals from current vertex positions (reference
    ``tfComputeNormals``, utils.py:71-83: ``cross(v1−v0, v2−v1)`` then
    normalize_tensor)."""
    tri = jnp.take(points, faces.astype(jnp.int32), axis=0)     # [F, 3, 3]
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 1])
    return normalize_tensor(n)


def init_moments_norm(key: jax.Array, channels: int, std_dev: float = 0.05) -> Dict:
    kg, kb = jax.random.split(key)
    return {
        "gamma": jax.random.normal(kg, (channels,)) * std_dev,
        "beta": jax.random.normal(kb, (channels,)) * std_dev,
    }


def moments_norm(
    params: Dict[str, jnp.ndarray], x: jnp.ndarray, epsilon: float = 1e-6
) -> jnp.ndarray:
    """Moment-based normalization over the node axis with learned scale/shift
    (reference ``batch_norm`` fullNorm path, model.py:408-416; unused by the
    default model but part of the op inventory)."""
    mean = jnp.mean(x, axis=0)
    var = jnp.var(x, axis=0)
    inv = jax.lax.rsqrt(var + epsilon)
    return (x - mean) * inv * params["gamma"] + params["beta"]
