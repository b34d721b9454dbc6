"""Tensor parallelism for the wide MLP head.

The reference has no TP (SURVEY.md §2.7); its only wide weights are the
Lin(1024) heads (model.py:937). This module provides the optional pjit param
sharding the survey calls for: shard the fc hidden dimension over a mesh
axis so the two head matmuls become column-/row-parallel with the reduction
handled by XLA's sharding propagation (the standard Megatron-style split —
no explicit collectives needed under jit).

Use when fc_channels is scaled far beyond 1024 or memory-per-chip is tight;
at the reference's sizes the heads are small and DP/graph sharding dominate.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def unet_param_shardings(params: Dict[str, Any], mesh: Mesh, axis: str = "graph"):
    """A pytree of NamedShardings for the U-Net params: fc hidden dims are
    sharded over ``axis`` (column-parallel fc1 / fc_mid / fc_coarse, then
    row-parallel out heads); everything else is replicated."""
    def spec_for(path: str, leaf) -> P:
        if path.startswith(("fc1", "fc_mid", "fc_coarse")):
            if leaf.ndim == 2:            # [in, hidden] → shard hidden (cols)
                return P(None, axis)
            return P(axis)                # bias [hidden]
        if path.startswith(("out0", "out1", "out2")) and leaf.ndim == 2:
            return P(axis, None)          # [hidden, out] → shard hidden (rows)
        return P()

    out = {}
    for name, group in params.items():
        out[name] = {
            k: NamedSharding(mesh, spec_for(name, v)) for k, v in group.items()
        }
    return out


def shard_unet_params(params: Dict[str, Any], mesh: Mesh, axis: str = "graph"):
    """Place the params according to :func:`unet_param_shardings`."""
    shardings = unet_param_shardings(params, mesh, axis=axis)
    return jax.tree_util.tree_map(
        lambda leaf, sh: jax.device_put(leaf, sh), params, shardings
    )
