"""Device op library (JAX/XLA/Pallas).

TPU-first re-design of the reference's TF graph ops (`model.py:74-830`,
`train.py:1467-1798`):

- no fake batch-1 dimension: ops take ``[N, C]`` signals and are batched with
  ``jax.vmap`` / sharded with ``shard_map`` when needed;
- the graph convolution uses the aggregate-then-transform factorization
  ``Σ_j q_ijm (W_m x_j) = W_m (Σ_j q_ijm x_j)``, cutting neighbour-gather HBM
  traffic by ``M·out/C`` versus the reference formulation while remaining
  bit-equivalent math (a direct gather formulation is kept as oracle);
- static shapes everywhere; padded slots ride the zero-row gather exactly
  like the reference's one-indexed adjacency.
"""

from facet_graph_convolution_tpu.ops.gather import gather_neighbors  # noqa: F401
from facet_graph_convolution_tpu.ops.conv import (  # noqa: F401
    FacetConvVariant,
    init_facet_conv,
    facet_conv,
    facet_conv_gather,
    init_facet_conv_pos_assignment,
    facet_conv_pos_assignment,
    init_facet_conv_only_pos_assignment,
    facet_conv_only_pos_assignment,
    init_linear,
    linear,
    assignment_weights,
    rotation_to_axis,
)
from facet_graph_convolution_tpu.ops.conv import facet_conv_nminor  # noqa: F401
from facet_graph_convolution_tpu.ops.pallas_conv import (  # noqa: F401
    facet_conv_pallas,
    gather_slot_major,
)
from facet_graph_convolution_tpu.ops.pooling import (  # noqa: F401
    tree_pool,
    tree_pool_nminor,
    tree_unpool,
    tree_unpool_nminor,
)
from facet_graph_convolution_tpu.ops.normalization import (  # noqa: F401
    normalize_tensor,
    dot_last,
    lrelu,
    moments_norm,
    face_normals_device,
)
from facet_graph_convolution_tpu.ops.vertex_update import (  # noqa: F401
    update_positions_edges,
    update_positions_depth,
    update_positions_multiscale,
    face_centers_pyramid,
)
