"""Inference CLI (reference ``infer.py:126-164``), plus serving extensions
the reference lacks: ``--batch`` runs all input meshes through the batched
:class:`~facet_graph_convolution_tpu.inference.serving.InferenceServer`
(one device call for every patch of every mesh), and ``--export_forward``
writes an ahead-of-time compiled forward executable for external serving.
"""

import argparse
import glob
import os

from facet_graph_convolution_tpu.config import add_cli_overrides, config_from_args
from facet_graph_convolution_tpu.inference.driver import infer_directory


def main():
    parser = add_cli_overrides(argparse.ArgumentParser())
    parser.add_argument("--batch", action="store_true",
                        help="serve all meshes via one batched forward")
    parser.add_argument("--export_forward", type=str, default=None,
                        help="write an AOT-exported forward executable to "
                             "this path and exit (requires --export_nodes)")
    parser.add_argument("--export_nodes", type=int, default=21504,
                        help="node bucket size for --export_forward")
    parser.add_argument("--export_widths", type=str, default="23,23,23",
                        help="per-level adjacency widths for --export_forward")
    args = parser.parse_args()
    cfg = config_from_args(args)

    if args.export_forward:
        from facet_graph_convolution_tpu.inference.driver import _restore_params
        from facet_graph_convolution_tpu.inference.serving import (
            export_forward,
            save_exported,
        )

        params = _restore_params(cfg, multi_scale=False)
        widths = [int(w) for w in args.export_widths.split(",")]
        data = export_forward(cfg, params, args.export_nodes, widths)
        save_exported(args.export_forward, data)
        print(f"Exported compiled forward → {args.export_forward} "
              f"({len(data)} bytes)")
        return

    input_dir = args.input_dir or cfg.data.test_data_path
    if args.batch:
        from facet_graph_convolution_tpu.geometry import load_obj, write_obj
        from facet_graph_convolution_tpu.inference.driver import _restore_params
        from facet_graph_convolution_tpu.inference.serving import InferenceServer

        params = _restore_params(cfg, multi_scale=False)
        server = InferenceServer(cfg, params=params)
        paths = sorted(glob.glob(os.path.join(input_dir, "*.obj")))
        meshes = []
        for p in paths:
            v, f, _ = load_obj(p)
            meshes.append((v, f))
        results = server.denoise_batch(meshes)
        os.makedirs(cfg.eval.results_path, exist_ok=True)
        for p, (v, f), (refined, _) in zip(paths, meshes, results):
            name = os.path.splitext(os.path.basename(p))[0]
            out = os.path.join(cfg.eval.results_path, name + "_denoised.obj")
            write_obj(refined, f, out)
            print(f"{name}: {refined.shape[0]} vertices → {out}")
    else:
        infer_directory(input_dir, cfg)
    print(f"Inference complete. Results saved to {cfg.eval.results_path}")


if __name__ == "__main__":
    main()
