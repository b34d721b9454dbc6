"""Inference: patch prediction, overlap reassembly, vertex refinement."""

from facet_graph_convolution_tpu.inference.driver import (  # noqa: F401
    infer_normals,
    infer_with_vertices,
    infer_directory,
)
from facet_graph_convolution_tpu.inference.serving import (  # noqa: F401
    InferenceServer,
    export_forward,
    load_forward,
)
from facet_graph_convolution_tpu.inference.sharded import (  # noqa: F401
    infer_normals_sharded,
    infer_with_vertices_sharded,
)
