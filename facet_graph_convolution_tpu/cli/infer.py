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
    parser.add_argument("--bake_params", action="store_true",
                        help="freeze weights into the exported executable "
                             "(default: params are a call argument, so "
                             "checkpoints swap without re-export)")
    args = parser.parse_args()
    cfg = config_from_args(args)

    if args.export_forward:
        from facet_graph_convolution_tpu.inference.driver import _restore_params
        from facet_graph_convolution_tpu.inference.serving import (
            export_forward,
            save_exported,
        )

        multi = cfg.model.include_vertices
        params = _restore_params(cfg, multi_scale=multi)
        widths = [int(w) for w in args.export_widths.split(",")]
        data = export_forward(cfg, params, args.export_nodes, widths,
                              multi_scale=multi, bake_params=args.bake_params)
        save_exported(args.export_forward, data)
        print(f"Exported compiled {'multi-scale ' if multi else ''}forward → "
              f"{args.export_forward} ({len(data)} bytes, params "
              f"{'baked' if args.bake_params else 'as argument'})")
        return

    input_dir = args.input_dir or cfg.data.test_data_path
    if args.batch:
        from facet_graph_convolution_tpu.geometry import load_obj, write_obj
        from facet_graph_convolution_tpu.inference.driver import _restore_params
        from facet_graph_convolution_tpu.inference.serving import InferenceServer

        with_verts = cfg.model.include_vertices
        params = _restore_params(cfg, multi_scale=with_verts)
        server = InferenceServer(cfg, params=params,
                                 include_vertices=with_verts)
        paths = sorted(glob.glob(os.path.join(input_dir, "*.obj")))
        meshes = []
        for p in paths:
            v, f, _ = load_obj(p)
            meshes.append((v, f))
        results = server.denoise_batch(meshes)
        os.makedirs(cfg.eval.results_path, exist_ok=True)
        for p, (v, f), res in zip(paths, meshes, results):
            name = os.path.splitext(os.path.basename(p))[0]
            out = os.path.join(cfg.eval.results_path, name + "_denoised.obj")
            refined = res["points"] if with_verts else res[0]
            write_obj(refined, f, out)
            print(f"{name}: {refined.shape[0]} vertices → {out}")
    else:
        infer_directory(input_dir, cfg)
    print(f"Inference complete. Results saved to {cfg.eval.results_path}")


if __name__ == "__main__":
    main()
