"""Reference-parity harness: per-layer activation comparison.

BASELINE.md's verification plan calls for per-layer activation ``allclose``
against the reference network on identical inputs. The reference is TF1 and
cannot run in this environment, so the harness works over an exported
``.npz`` exchange format:

- ``export_activations`` runs our U-Net capturing every intermediate and
  writes them (plus params and inputs) to npz;
- ``compare_activations`` loads two such files (ours vs a reference export
  produced by an external TF run with matching names) and reports per-layer
  max-abs differences.

Layer names follow the reference scopes (model.py:853-941): conv1, pool1,
conv2, pool2, conv3, dconv3, upsamp2, upconv2, dconv2, upsamp1, upconv1,
dconv1, fc1, out0.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from facet_graph_convolution_tpu.models.unet import unet_apply
from facet_graph_convolution_tpu.ops.conv import FacetConvVariant, facet_conv, linear
from facet_graph_convolution_tpu.ops.normalization import lrelu
from facet_graph_convolution_tpu.ops.pooling import tree_pool, tree_unpool


def capture_activations(
    params: Dict,
    x: jnp.ndarray,
    adjs: Sequence[jnp.ndarray],
    coarsening_steps: int = 2,
    alpha: float = 0.1,
) -> Dict[str, np.ndarray]:
    """Forward pass mirroring ``unet_apply`` (single-scale path) that records
    every named intermediate."""
    acts: Dict[str, np.ndarray] = {"input": np.asarray(x)}

    def conv(name, h, a):
        out = facet_conv(params[name], h, a, variant=FacetConvVariant.DEFAULT)
        acts[name] = np.asarray(out)
        return out

    h1 = lrelu(conv("conv1", x, adjs[0]), alpha)
    acts["conv1_act"] = np.asarray(h1)
    p1 = tree_pool(h1, steps=coarsening_steps, mode="max")
    acts["pool1"] = np.asarray(p1)
    h2 = lrelu(conv("conv2", p1, adjs[1]), alpha)
    p2 = tree_pool(h2, steps=coarsening_steps, mode="max")
    acts["pool2"] = np.asarray(p2)
    h3 = lrelu(conv("conv3", p2, adjs[2]), alpha)
    d3 = lrelu(conv("dconv3", h3, adjs[2]), alpha)
    u2 = tree_unpool(d3, steps=coarsening_steps)
    acts["upsamp2"] = np.asarray(u2)
    u2 = conv("upconv2", u2, adjs[1])
    d2 = lrelu(conv("dconv2", jnp.concatenate([u2, h2], axis=-1), adjs[1]), alpha)
    u1 = tree_unpool(d2, steps=coarsening_steps)
    acts["upsamp1"] = np.asarray(u1)
    u1 = conv("upconv1", u1, adjs[0])
    d1 = lrelu(conv("dconv1", jnp.concatenate([u1, h1], axis=-1), adjs[0]), alpha)
    h = lrelu(linear(params["fc1"], d1), alpha)
    acts["fc1"] = np.asarray(h)
    y = linear(params["out0"], h)
    acts["out0"] = np.asarray(y)
    return acts


def export_activations(path: str, params, x, adjs, **kwargs) -> Dict[str, np.ndarray]:
    acts = capture_activations(params, x, adjs, **kwargs)
    arrays = {f"act_{k}": v for k, v in acts.items()}
    arrays["input_x"] = np.asarray(x)
    for i, a in enumerate(adjs):
        arrays[f"adj_{i}"] = np.asarray(a)
    np.savez_compressed(path, **arrays)
    return acts


def compare_activations(
    path_a: str, path_b: str, atol: float = 1e-4
) -> Dict[str, float]:
    """Per-layer max-abs difference between two exports; raises AssertionError
    listing offending layers when any exceeds ``atol``."""
    a = np.load(path_a)
    b = np.load(path_b)
    report: Dict[str, float] = {}
    failures = []
    for key in sorted(a.files):
        if not key.startswith("act_"):
            continue
        if key not in b.files:
            failures.append(f"{key}: missing in {path_b}")
            continue
        diff = float(np.max(np.abs(a[key] - b[key])))
        report[key[4:]] = diff
        if diff > atol:
            failures.append(f"{key[4:]}: max|Δ| = {diff:.3e}")
    if failures:
        raise AssertionError("activation parity failed:\n  " + "\n  ".join(failures))
    return report
