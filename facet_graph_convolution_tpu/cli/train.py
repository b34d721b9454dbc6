"""Training CLI (reference ``train.py:1942-1978`` → ``mainFunction``)."""

import argparse
import os

from facet_graph_convolution_tpu.config import add_cli_overrides, config_from_args
from facet_graph_convolution_tpu.data.dataset import load_dataset
from facet_graph_convolution_tpu.training.trainer import (
    train_normals,
    train_with_vertices,
)


def main():
    parser = add_cli_overrides(argparse.ArgumentParser())
    parser.add_argument(
        "--steps_per_call", type=int, default=None,
        help="scan this many train steps per dispatch (default: 100 on TPU, "
             "1 elsewhere) — amortizes host/tunnel latency",
    )
    parser.add_argument(
        "--stream_dir", type=str, default=None,
        help="train from a sharded dataset directory (data/stream.py) with "
             "background prefetch instead of loading the whole set",
    )
    args = parser.parse_args()
    cfg = config_from_args(args)
    if args.stream_dir:
        import jax

        from facet_graph_convolution_tpu.training.trainer import (
            train_normals_streaming,
        )

        steps_per_call = args.steps_per_call
        if steps_per_call is None:
            steps_per_call = 100 if jax.default_backend() == "tpu" else 1
        suffix = "WithVertices" if cfg.model.include_vertices else ""
        valid_path = os.path.join(cfg.data.binary_dump_path,
                                  f"validSet{suffix}.npz")
        valid_set = (load_dataset(valid_path)
                     if os.path.isfile(valid_path) else None)
        train_normals_streaming(cfg, args.stream_dir, valid_set=valid_set,
                                steps_per_call=steps_per_call)
        return
    suffix = "WithVertices" if cfg.model.include_vertices else ""
    train_path = os.path.join(cfg.data.binary_dump_path, f"trainingSet{suffix}.npz")
    valid_path = os.path.join(cfg.data.binary_dump_path, f"validSet{suffix}.npz")
    train_set = load_dataset(train_path)
    valid_set = load_dataset(valid_path) if os.path.isfile(valid_path) else None

    if cfg.model.include_vertices:
        train_with_vertices(cfg, train_set, valid_set)
    else:
        import jax

        steps_per_call = args.steps_per_call
        if steps_per_call is None:
            steps_per_call = 100 if jax.default_backend() == "tpu" else 1
        train_normals(cfg, train_set, valid_set, steps_per_call=steps_per_call)


if __name__ == "__main__":
    main()
