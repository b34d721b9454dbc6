"""Shape-family accuracy evidence (VERDICT r2 item 4): train ONE config on a
mixed synthetic set, then evaluate held-out meshes from THREE shape families
— smooth (sphere), chamfered box, cylinder-on-plate — reporting per-shape
per-noise mean angular error (noisy | bilateral | ours) and the oversampled
Hausdorff of the solver-updated vertices (noisy | ours), the reference's own
metrics (computeMetrics.py:72-97).

    python examples/shape_family_eval.py --iters 3000 [--out /tmp/fgc_shapes]

Feature preservation on the sharp-crease shapes is the paper's core claim;
the trained net must beat the bilateral baseline on ALL families from one
training run.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=3000)
    parser.add_argument("--out", type=str, default="/tmp/fgc_shapes")
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--lr-schedule", type=str, default="cosine",
                        choices=("constant", "cosine"))
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fgc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from facet_graph_convolution_tpu.config import default_config
    from facet_graph_convolution_tpu.data.dataset import InferenceMesh, TrainingSet
    from facet_graph_convolution_tpu.data.synthetic import (
        add_vertex_noise,
        box,
        chamfered_box,
        cylinder_on_plate,
        icosphere,
        torus,
    )
    from facet_graph_convolution_tpu.evaluation.metrics import (
        angular_error_stats,
        hausdorff_oversampled,
    )
    from facet_graph_convolution_tpu.geometry import (
        compute_face_normals,
        triangle_areas,
        triangle_barycenters,
    )
    from facet_graph_convolution_tpu.geometry.filters import bilateral_filter_normals
    from facet_graph_convolution_tpu.geometry.mesh_math import average_edge_length
    from facet_graph_convolution_tpu.geometry.pointset import dense_point_cloud
    from facet_graph_convolution_tpu.inference.driver import infer_normals
    from facet_graph_convolution_tpu.training.trainer import train_normals

    rng = np.random.default_rng(0)
    os.makedirs(args.out, exist_ok=True)

    # --- one mixed training set: all families, train-resolution instances.
    # Per-family parameter variation (chamfer widths, cylinder radii, box
    # aspect) mirrors the reference's multi-mesh Wang training set — the
    # held-out test instances below use resolutions/parameters absent here.
    train_shapes = [
        ("sphere", *icosphere(3)),
        ("torus", *torus(nu=56, nv=28)),
        ("torus_thin", *torus(minor=0.25, nu=48, nv=20)),
        ("box", *box(10, 10, 10)),
        ("box_flat", *box(14, 14, 6, size=(1.2, 1.2, 0.5))),
        ("chamfered_box", *chamfered_box(12)),
        ("chamfered_box_wide", *chamfered_box(10, chamfer=0.18)),
        ("chamfered_box_narrow", *chamfered_box(14, chamfer=0.07)),
        ("cylinder_on_plate", *cylinder_on_plate(48)),
        ("cylinder_on_plate_thin", *cylinder_on_plate(40, r_cyl=0.3, h_cyl=1.0)),
        ("cylinder_on_plate_fat", *cylinder_on_plate(56, r_cyl=0.6, h_plate=0.3)),
    ]
    train_set = TrainingSet(
        max_patch_size=20000, coarsening_steps=2, coarsening_levels=3,
        k_faces=23, seed=0,
    )
    t0 = time.time()
    for name, v, f in train_shapes:
        for level in (0.05, 0.1, 0.2, 0.3):
            noisy = add_vertex_noise(v, f, level, rng)
            train_set.add_mesh(noisy, f, gt_vertices=v)
    print(f"dataset: {len(train_set.patches)} patches ({time.time()-t0:.1f}s)",
          flush=True)

    cfg = default_config().replace(
        train={
            "network_path": os.path.join(args.out, "networks/"),
            "net_name": "shapes",
            "save_every": max(args.iters // 2, 500),
            "loss_samples": 4000,
            "lr_schedule": args.lr_schedule,
        },
        model={"compute_dtype": "bfloat16" if args.bf16 else "float32"},
    )
    state, hist = train_normals(
        cfg, train_set, num_iterations=args.iters, bucket_align=1024,
        log_every=200, steps_per_call=100,
    )

    # --- held-out instances: DIFFERENT resolutions of each family ---
    test_shapes = [
        ("sphere", *icosphere(4)),
        ("chamfered_box", *chamfered_box(16, chamfer=0.1)),
        ("cylinder_on_plate", *cylinder_on_plate(64, n_h=5, n_r=5)),
    ]
    rows = []
    for name, v, f in test_shapes:
        gt_n = compute_face_normals(v, f)
        dense_gt = dense_point_cloud(v, f)
        for level in (0.1, 0.2, 0.3):
            noisy = add_vertex_noise(v, f, level, np.random.default_rng(99))
            mesh = InferenceMesh(
                max_patch_size=20000, coarsening_steps=2, coarsening_levels=3,
                k_faces=23, seed=0,
            )
            mesh.add_mesh(noisy, f)
            points, pred_normals = infer_normals(mesh, cfg, params=state.params)

            noisy_n = compute_face_normals(noisy, f)
            el, _ = average_edge_length(noisy, f)
            bilateral = bilateral_filter_normals(
                triangle_barycenters(noisy, f, normalize=False),
                noisy_n,
                triangle_areas(noisy, f),
                sigma_s=2.0 * el,
                sigma_r=0.35,
            )
            # oversampled Hausdorff of updated vertices vs GT (reference
            # computeMetrics.py:72) — mean accuracy, BB-diag normalized
            dense_ours = dense_point_cloud(np.asarray(points), f)
            dense_noisy = dense_point_cloud(noisy, f)
            h_ours = hausdorff_oversampled(points, v, dense_ours, dense_gt)
            h_noisy = hausdorff_oversampled(noisy, v, dense_noisy, dense_gt)
            row = {
                "shape": name,
                "noise": level,
                "ang_noisy": round(angular_error_stats(noisy_n, gt_n)[0], 2),
                "ang_bilateral": round(angular_error_stats(bilateral, gt_n)[0], 2),
                "ang_ours": round(angular_error_stats(pred_normals, gt_n)[0], 2),
                "hauss_mean_noisy": round(h_noisy[2], 5),
                "hauss_mean_ours": round(h_ours[2], 5),
            }
            rows.append(row)
            print(f"{name:18s} noise {level:.1f}: "
                  f"ang noisy {row['ang_noisy']:6.2f}° "
                  f"bilateral {row['ang_bilateral']:6.2f}° "
                  f"ours {row['ang_ours']:6.2f}°   "
                  f"hauss noisy {row['hauss_mean_noisy']:.5f} "
                  f"ours {row['hauss_mean_ours']:.5f}", flush=True)

    report = os.path.join(args.out, "shape_family_report.json")
    with open(report, "w") as fh:
        json.dump(rows, fh, indent=1)
    print("report →", report)


if __name__ == "__main__":
    main()
