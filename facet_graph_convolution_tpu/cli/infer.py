"""Inference CLI (reference ``infer.py:126-164``)."""

import argparse

from facet_graph_convolution_tpu.config import add_cli_overrides, config_from_args
from facet_graph_convolution_tpu.inference.driver import infer_directory


def main():
    parser = add_cli_overrides(argparse.ArgumentParser())
    args = parser.parse_args()
    cfg = config_from_args(args)
    input_dir = args.input_dir or cfg.data.test_data_path
    infer_directory(input_dir, cfg)
    print(f"Inference complete. Results saved to {cfg.eval.results_path}")


if __name__ == "__main__":
    main()
