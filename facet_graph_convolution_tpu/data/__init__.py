"""Datasets and preprocessing: mesh → padded facet-graph patches."""

from facet_graph_convolution_tpu.data.dataset import (  # noqa: F401
    FacetPatch,
    MeshDataset,
    TrainingSet,
    InferenceMesh,
    build_patch,
    save_dataset,
    load_dataset,
)
from facet_graph_convolution_tpu.data.preprocess import preprocess_directory  # noqa: F401
from facet_graph_convolution_tpu.data.stream import (  # noqa: F401
    PrefetchLoader,
    ShardedDataset,
    save_sharded,
)
