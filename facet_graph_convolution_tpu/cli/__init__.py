"""Command-line entry points (reference __main__ blocks in preprocess.py,
train.py, infer.py, computeMetrics.py):

    python -m facet_graph_convolution_tpu.cli.preprocess [--base_path ...]
    python -m facet_graph_convolution_tpu.cli.train [--num_iterations ...]
    python -m facet_graph_convolution_tpu.cli.infer --input_dir ...
    python -m facet_graph_convolution_tpu.cli.metrics
"""
