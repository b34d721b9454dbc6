"""Metrics CLI (reference ``computeMetrics.py:142-143``)."""

import argparse

from facet_graph_convolution_tpu.config import add_cli_overrides, config_from_args
from facet_graph_convolution_tpu.evaluation.driver import compute_metrics


def main():
    parser = add_cli_overrides(argparse.ArgumentParser())
    cfg = config_from_args(parser.parse_args())
    compute_metrics(cfg)


if __name__ == "__main__":
    main()
