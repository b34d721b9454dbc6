"""Multi-chip runtime: device meshes, data parallelism, halo-exchange
graph partitioning.

The reference implements no parallelism of any kind (single device, batch
size hard-set to 1 — train.py:404-405; overlapping patches reconciled by
post-hoc averaging — train.py:123-126). This package supplies the TPU-native
equivalents:

- :mod:`data_parallel` — patch-batch data parallelism over a mesh axis;
- :mod:`halo` — ONE large facet graph edge-partitioned across chips with
  per-layer boundary-activation exchange over ICI (``ppermute`` inside
  ``shard_map``), reproducing the single-device result exactly — unlike the
  reference's lossy overlap averaging.
"""

from facet_graph_convolution_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    local_device_count,
)
from facet_graph_convolution_tpu.parallel.data_parallel import (  # noqa: F401
    make_dp_train_step,
    stack_patches,
    train_normals_dp,
)
from facet_graph_convolution_tpu.parallel.tensor_parallel import (  # noqa: F401
    shard_unet_params,
    unet_param_shardings,
)
from facet_graph_convolution_tpu.parallel.halo import (  # noqa: F401
    GraphPartition,
    build_partition,
    partition_operands_nminor,
    sharded_unet_apply,
    sharded_unet_forward_local_nminor,
    make_sharded_train_step,
    train_normals_sharded,
)
from facet_graph_convolution_tpu.parallel.vertex_halo import (  # noqa: F401
    partition_index_map,
    sharded_update_positions_edges,
    sharded_update_positions_multiscale,
)
from facet_graph_convolution_tpu.parallel.vertex_train import (  # noqa: F401
    make_sharded_vertex_train_step,
    prepare_vertex_training,
    train_with_vertices_sharded,
)
