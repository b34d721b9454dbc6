"""Preprocessing CLI (reference ``preprocess.py:51-58``)."""

import argparse

from facet_graph_convolution_tpu.config import add_cli_overrides, config_from_args
from facet_graph_convolution_tpu.data.preprocess import preprocess_directory


def main():
    parser = add_cli_overrides(argparse.ArgumentParser())
    parser.add_argument(
        "--shard_size", type=int, default=None,
        help="also write the training set as streaming shards of this many "
             "patches (for `train --stream_dir`)",
    )
    args = parser.parse_args()
    cfg = config_from_args(args)
    preprocess_directory(cfg, shard_size=args.shard_size)
    print(f"Preprocessing complete. Dumps saved to {cfg.data.binary_dump_path}")


if __name__ == "__main__":
    main()
