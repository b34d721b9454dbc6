"""Losses: angular facet-normal losses and sampled chamfer point-set losses.

Parity targets: ``faceNormalsLoss`` (train.py:1272-1294),
``charbonnierFaceNormalsLoss`` (train.py:1297-1325), ``accuracyLoss``
(train.py:1332-1369), ``fullLoss`` (train.py:1373-1424),
``sampledAccuracyLoss`` (train.py:1428-1462).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from facet_graph_convolution_tpu.ops.normalization import dot_last

_CLOSE_TO_ONE = 0.9999999  # acos clamp (train.py:1278)


def _pairwise_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs Euclidean distance [len(a), len(b)] with a NaN-safe
    backward: ``jnp.linalg.norm``'s gradient is ``diff / dist`` — 0/0 = NaN
    whenever a pair coincides exactly, and that NaN reaches EVERY parameter
    through the min-reduction's unselected branches (mask · NaN = NaN).
    ``sqrt(d² + tiny)`` keeps the gradient ``diff / sqrt(d² + tiny)`` → 0 at
    coincident pairs; the 1e-20 offset shifts distances by < 1e-10, far
    below the 1e-3-scale distances the chamfer losses operate on."""
    d2 = jnp.sum(jnp.square(a[:, None, :] - b[None, :, :]), axis=-1)
    return jnp.sqrt(d2 + 1e-20)


def _threshold(dist: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """``dist`` where ≤ threshold else 0 — written NaN-TRANSPARENTLY.
    The reference's ``where(dist <= thr, dist, 0)`` maps NaN distances to
    0 (NaN <= thr is False), so a NaN-poisoned state trains on with a
    plausible-looking finite loss and the drivers' NaN-abort guards never
    fire. ``where(dist > thr, 0, dist)`` computes the identical value for
    finite inputs and lets NaN through to the loss, turning silent collapse
    into a loud abort."""
    return jnp.where(dist > threshold, 0.0, dist)


def _fake_node_mask(gt: jnp.ndarray) -> jnp.ndarray:
    """Fake (padding) nodes are those whose GT normal has |·|₁ ≤ 1e-3
    (reference train.py:1280-1281)."""
    return jnp.sum(jnp.abs(gt), axis=-1) <= 10e-4


def face_normals_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean angular error in degrees over real nodes:
    ``acos(clamp(⟨n, n_gt⟩, ±0.9999999)) · 180/π`` with fake nodes masked
    from numerator and denominator (reference ``faceNormalsLoss``)."""
    dp = dot_last(pred, gt)
    ang = jnp.arccos(jnp.clip(dp, -_CLOSE_TO_ONE, _CLOSE_TO_ONE)) * (180.0 / math.pi)
    fake = _fake_node_mask(gt)
    real = jnp.where(fake, 0.0, 1.0)
    ang = jnp.where(fake, 0.0, ang)
    return jnp.sum(ang) / jnp.sum(real)


def charbonnier_face_normals_loss(
    pred: jnp.ndarray, gt: jnp.ndarray, epsilon: float = 10e-4
) -> jnp.ndarray:
    """Charbonnier-smoothed variant (reference, unused by default,
    train.py:1297-1325): sqrt(Σ angle² + ε²) normalized by real-node count."""
    dp = dot_last(pred, gt)
    close = 0.999999999
    ang = jnp.arccos(jnp.clip(dp, -close, close))
    fake = _fake_node_mask(gt)
    real = jnp.where(fake, 0.0, 1.0)
    sq = jnp.where(fake, 0.0, jnp.square(ang))
    loss = jnp.sqrt(jnp.sum(sq, axis=-1) + epsilon * epsilon)
    return jnp.sum(loss) / jnp.sum(real)


def accuracy_loss(
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    sample_idx: jnp.ndarray,
    threshold: float = 5.0,
) -> jnp.ndarray:
    """Thresholded precision + completeness between a sampled subset of p0 and
    the full p1, ×1000 (reference ``accuracyLoss``, train.py:1332-1369)."""
    sp0 = jnp.take(p0, sample_idx, axis=0)
    dist = _pairwise_dist(sp0, p1)
    precision = jnp.min(dist, axis=1)
    completeness = jnp.min(dist, axis=0)
    precision = _threshold(precision, threshold)
    return 1000.0 * (jnp.mean(precision) + jnp.mean(completeness))


def full_chamfer_loss(
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    sample_idx0: jnp.ndarray,
    sample_idx1: jnp.ndarray,
    accuracy_threshold: float = 5000.0,
    completeness_threshold: float = 5000.0,
) -> jnp.ndarray:
    """Sampled symmetric chamfer (reference ``fullLoss``, train.py:1373-1424):
    sampled-p0 → full-p1 precision plus full-p0 → sampled-p1 completeness,
    both thresholded, ×1000. Keeping both pairings avoids the O(N²) full
    distance matrix while supervising every point."""
    sp0 = jnp.take(p0, sample_idx0, axis=0)
    sp1 = jnp.take(p1, sample_idx1, axis=0)

    dist0 = _pairwise_dist(sp0, p1)                                     # [s0, N1]
    dist1 = _pairwise_dist(p0, sp1)                                     # [N0, s1]

    precision = jnp.min(dist0, axis=1)
    completeness = jnp.min(dist1, axis=0)
    precision = _threshold(precision, accuracy_threshold)
    completeness = _threshold(completeness, completeness_threshold)
    return 1000.0 * (jnp.mean(precision) + jnp.mean(completeness))


def sampled_accuracy_loss(
    p0: jnp.ndarray, p1: jnp.ndarray, threshold: float = 5.0
) -> jnp.ndarray:
    """Full symmetric chamfer with precision thresholding (reference
    ``sampledAccuracyLoss``, train.py:1428-1462)."""
    dist = _pairwise_dist(p0, p1)
    accu = jnp.min(dist, axis=1)
    completeness = jnp.min(dist, axis=0)
    accu = _threshold(accu, threshold)
    return 1000.0 * (jnp.mean(accu) + jnp.mean(completeness))
