"""facet_graph_convolution_tpu — TPU-native facet-graph convolution framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``Elensil/Facet_Graph_Convolution`` (Armando, Franco, Boyer — "Mesh Denoising
with Facet Graph Convolutions", TVCG 2021): mesh denoising by multi-scale
graph convolution over the facet graph, followed by a differentiable vertex
position solver.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

- :mod:`~facet_graph_convolution_tpu.config`      — dataclass configuration
  (replaces reference ``settings.py``).
- :mod:`~facet_graph_convolution_tpu.geometry`    — mesh I/O + geometry math,
  vectorized NumPy (replaces reference ``utils.py`` L1 loops).
- :mod:`~facet_graph_convolution_tpu.graph`       — facet-graph construction,
  Graclus coarsening, BFS patching (host; optional C++ fast path).
- :mod:`~facet_graph_convolution_tpu.ops`         — device op library: facet
  graph convolution (gather reference + aggregate-first fast path + Pallas
  kernels), binary-tree pooling, normalization, vertex-update solvers.
- :mod:`~facet_graph_convolution_tpu.models`      — multi-scale U-Net, losses,
  augmentation.
- :mod:`~facet_graph_convolution_tpu.parallel`    — device-mesh runtime:
  data-parallel patch batching and halo-exchange graph partitioning
  (shard_map + collectives).
- :mod:`~facet_graph_convolution_tpu.data`        — preprocessing pipeline and
  dataset containers.
- :mod:`~facet_graph_convolution_tpu.training`    — jitted train steps, Orbax
  checkpointing, drivers.
- :mod:`~facet_graph_convolution_tpu.inference`   — patch inference and mesh
  reassembly.
- :mod:`~facet_graph_convolution_tpu.evaluation`  — metrics (angular error,
  Hausdorff), heatmaps, CSV reports.
"""

__version__ = "0.1.0"

from facet_graph_convolution_tpu.config import Config, default_config  # noqa: F401
