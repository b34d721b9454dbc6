"""Facet-graph construction, format conversion, coarsening, and patching.

Host-side (NumPy/SciPy) with an optional C++ fast path
(:mod:`facet_graph_convolution_tpu.graph.native`) for the sequential hot
loops (Graclus matching, BFS patch growth).

The canonical device format is the padded K-list ``fadj[N, K]`` of the
reference (one-indexed, slot 0 = self, 0 = padding —
`/root/reference/Code/utils.py:243-295`), which maps to TPU-friendly static
shapes; a COO edge view is derived for coarsening and for the edge-partitioned
multi-chip path.
"""

from facet_graph_convolution_tpu.graph.adjacency import (  # noqa: F401
    face_adjacency_klist,
    vertex_adjacency_klist,
    vertex_ring_adjacency,
)
from facet_graph_convolution_tpu.graph.convert import (  # noqa: F401
    klist_to_coo,
    klist_to_coo_normal_weighted,
    coo_to_klist,
    dedupe_klist,
    transpose_adjacency,
    invert_permutation,
    klist_degrees,
)
from facet_graph_convolution_tpu.graph.coarsen import (  # noqa: F401
    coarsen_graph,
    graclus_levels,
    binary_tree_permutation,
    permute_adjacency,
    permute_data,
)
from facet_graph_convolution_tpu.graph.patching import (  # noqa: F401
    grow_graph_patch,
    grow_graph_patch_masked,
    grow_mesh_patch,
)
