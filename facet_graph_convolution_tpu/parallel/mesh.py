"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def local_device_count() -> int:
    return len(jax.devices())


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("data", "graph"),
) -> Mesh:
    """Build a mesh over all visible devices.

    Default layout: all devices on the ``graph`` axis (edge-partitioned large
    meshes) with a singleton ``data`` axis; pass ``axis_sizes`` for hybrid
    DP×graph layouts.
    """
    devices = np.asarray(jax.devices())
    if axis_sizes is None:
        axis_sizes = (1, len(devices))
    need = int(np.prod(axis_sizes))
    assert need <= len(devices), (
        f"mesh {tuple(axis_sizes)} needs {need} devices, "
        f"{len(devices)} available"
    )
    # a subset mesh (e.g. D=1 sharding-overhead benchmarks) uses the first
    # `need` devices
    return Mesh(devices[:need].reshape(tuple(axis_sizes)), axis_names)
