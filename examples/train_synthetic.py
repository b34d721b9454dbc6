"""End-to-end demo: train the facet-graph U-Net on synthetic noisy meshes and
compare angular error against the noisy input and the classical bilateral
baseline.

    python examples/train_synthetic.py --iters 3000 [--out /tmp/fgc_demo]

Generates spheres/tori/boxes at Wang-style noise levels, preprocesses them
into coarsened patches, trains with normals supervision, then denoises a
held-out mesh and reports:

    mean angular error (deg): noisy input | bilateral filter | ours
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=3000)
    parser.add_argument("--out", type=str, default="/tmp/fgc_demo")
    parser.add_argument("--subdiv", type=int, default=3)
    parser.add_argument("--bf16", action="store_true", default=True)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fgc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from facet_graph_convolution_tpu.config import default_config
    from facet_graph_convolution_tpu.data.dataset import InferenceMesh, TrainingSet
    from facet_graph_convolution_tpu.data.synthetic import (
        add_vertex_noise,
        box,
        icosphere,
        torus,
    )
    from facet_graph_convolution_tpu.evaluation.metrics import angular_error_stats
    from facet_graph_convolution_tpu.geometry import (
        compute_face_normals,
        triangle_areas,
        triangle_barycenters,
    )
    from facet_graph_convolution_tpu.geometry.filters import bilateral_filter_normals
    from facet_graph_convolution_tpu.geometry.mesh_math import average_edge_length
    from facet_graph_convolution_tpu.inference.driver import infer_normals
    from facet_graph_convolution_tpu.training.trainer import train_normals

    rng = np.random.default_rng(0)
    os.makedirs(args.out, exist_ok=True)

    # --- dataset ---
    shapes = [
        ("sphere", *icosphere(args.subdiv)),
        ("torus", *torus(nu=56, nv=28)),
        ("box", *box(10, 10, 10)),
        ("sphere_hi", *icosphere(args.subdiv + 1)),
    ]
    train_set = TrainingSet(
        max_patch_size=20000, coarsening_steps=2, coarsening_levels=3,
        k_faces=23, seed=0,
    )
    t0 = time.time()
    for name, v, f in shapes[:-1]:
        for level in (0.1, 0.2, 0.3):
            noisy = add_vertex_noise(v, f, level, rng)
            train_set.add_mesh(noisy, f, gt_vertices=v)
    print(f"dataset: {len(train_set.patches)} patches ({time.time()-t0:.1f}s)")

    # --- train ---
    cfg = default_config().replace(
        train={
            "network_path": os.path.join(args.out, "networks/"),
            "net_name": "demo",
            "save_every": max(args.iters // 2, 500),
            "eval_every": 200,
            "loss_samples": 4000,
        },
        model={"compute_dtype": "bfloat16" if args.bf16 else "float32"},
    )
    state, hist = train_normals(
        cfg, train_set, num_iterations=args.iters, bucket_align=1024,
        log_every=200, steps_per_call=100,
    )

    # --- held-out evaluation ---
    name, v, f = shapes[-1]
    report = []
    for level in (0.1, 0.2, 0.3):
        noisy = add_vertex_noise(v, f, level, np.random.default_rng(99))
        mesh = InferenceMesh(
            max_patch_size=20000, coarsening_steps=2, coarsening_levels=3,
            k_faces=23, seed=0,
        )
        mesh.add_mesh(noisy, f)
        points, pred_normals = infer_normals(mesh, cfg, params=state.params)

        gt_n = compute_face_normals(v, f)
        noisy_n = compute_face_normals(noisy, f)
        el, _ = average_edge_length(noisy, f)
        bilateral = bilateral_filter_normals(
            triangle_barycenters(noisy, f, normalize=False),
            noisy_n,
            triangle_areas(noisy, f),
            sigma_s=2.0 * el,
            sigma_r=0.35,
        )
        row = (
            level,
            angular_error_stats(noisy_n, gt_n)[0],
            angular_error_stats(bilateral, gt_n)[0],
            angular_error_stats(pred_normals, gt_n)[0],
        )
        report.append(row)
        print(f"noise {level:.1f}: noisy {row[1]:6.2f}°  bilateral {row[2]:6.2f}°  "
              f"ours {row[3]:6.2f}°", flush=True)

    with open(os.path.join(args.out, "report.txt"), "w") as fh:
        fh.write("level noisy bilateral ours\n")
        for row in report:
            fh.write(" ".join(f"{x:.3f}" for x in row) + "\n")
    print("report →", os.path.join(args.out, "report.txt"))


if __name__ == "__main__":
    main()
