"""Multi-host (DCN) runtime bootstrap.

The reference is strictly single-process / single-device (SURVEY.md §2.7: no
collectives, no multi-process launch anywhere). This module is the
framework's own multi-host story:

- :func:`initialize` wraps ``jax.distributed.initialize`` with environment
  autodetection, plus the CPU/gloo rig used to test multi-process execution
  without a pod;
- :func:`make_multihost_mesh` builds a device mesh whose ``graph`` axis is
  *process-contiguous*: each host owns one contiguous slab of the
  edge-partitioned graph, so halo ring hops between neighbouring shards ride
  ICI and only the hops that cross a slab boundary touch DCN (the
  partitioner batches those separately — parallel/halo.py
  ``devices_per_host``);
- :func:`distribute` / :func:`replicate` build global ``jax.Array``s from
  host-replicated NumPy data: every process holds the full (small) host
  arrays and contributes exactly its addressable shards, so drivers are
  process-count agnostic.

Pod launch is one line per host (see parallel/launch.py):

    python -m facet_graph_convolution_tpu.parallel.launch bench

On TPU pods ``jax.distributed.initialize()`` autodetects coordinator and
process ids from the TPU metadata; on CPU test rigs pass them explicitly.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    cpu_devices_per_process: Optional[int] = None,
) -> Tuple[int, int]:
    """Bootstrap the JAX distributed runtime; returns
    ``(process_index, process_count)``.

    Arguments fall back to ``FGC_COORDINATOR`` / ``FGC_NUM_PROCESSES`` /
    ``FGC_PROCESS_ID`` environment variables, then to JAX's own
    autodetection (which handles TPU pod metadata). When
    ``cpu_devices_per_process`` is set the process is configured as a
    CPU-platform worker (``gloo`` cross-process collectives + N virtual
    devices) — the pod-free test rig. Must be called before any JAX
    computation; an already-initialized backend is dropped and rebuilt.
    """
    coordinator_address = coordinator_address or os.environ.get("FGC_COORDINATOR")
    if num_processes is None and os.environ.get("FGC_NUM_PROCESSES"):
        num_processes = int(os.environ["FGC_NUM_PROCESSES"])
    if process_id is None and os.environ.get("FGC_PROCESS_ID"):
        process_id = int(os.environ["FGC_PROCESS_ID"])

    import jax

    if cpu_devices_per_process is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", cpu_devices_per_process)
        if (num_processes or 1) > 1:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        # the session environment may register a backend at interpreter
        # start (axon sitecustomize); drop it so the config above applies
        import jax.extend.backend

        jax.extend.backend.clear_backends()

    if coordinator_address is None and num_processes is None:
        # TPU pod path: full autodetection (a single-process run skips
        # distributed init entirely — collectives degrade to local)
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process / no pod metadata — run locally
    elif (num_processes or 1) > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id or 0,
        )
    return jax.process_index(), jax.process_count()


def devices_per_host() -> int:
    import jax

    return jax.local_device_count()


def make_multihost_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("data", "graph"),
):
    """Mesh over ALL processes' devices, ordered process-contiguously.

    Devices are sorted by ``(process_index, device id)`` and laid out so the
    last (``graph``) axis walks devices within a host first: contiguous graph
    shards s, s+1 sit on the same host except at host-slab boundaries —
    exactly the layout parallel/halo.py's ``devices_per_host`` partitioning
    assumes for its ICI-ring / batched-DCN split.
    """
    import jax
    from jax.sharding import Mesh

    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    devices = np.asarray(devices)
    if axis_sizes is None:
        axis_sizes = (1, len(devices))
    assert int(np.prod(axis_sizes)) == len(devices), (
        f"mesh {tuple(axis_sizes)} != {len(devices)} devices"
    )
    return Mesh(devices.reshape(tuple(axis_sizes)), axis_names)


def distribute(mesh, spec, arr):
    """Build a global ``jax.Array`` sharded as ``spec`` from a NumPy array
    every process holds in full. Each process materializes only its
    addressable shards; works identically for 1 or N processes."""
    import jax
    from jax.sharding import NamedSharding

    arr = np.asarray(arr)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def replicate(mesh, tree):
    """Replicate a pytree of host arrays across the mesh (spec ``P()``)."""
    import jax
    from jax.sharding import PartitionSpec as P

    return jax.tree.map(lambda a: distribute(mesh, P(), a), tree)
