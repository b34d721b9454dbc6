"""Activation-parity CLI: execute BASELINE.md's verification plan end-to-end.

    python -m facet_graph_convolution_tpu.cli.parity \
        --checkpoint Networks/net-300000 \
        --mesh Data/noisy/sphere_n1.obj \
        --out ours.npz [--reference reference_acts.npz]

Steps: read the reference's TF1 checkpoint (TF-free reader,
evaluation/tf_checkpoint.py), map its variable scopes onto the U-Net pytree,
build the mesh's graph pyramid exactly as the preprocessing pipeline does,
run the forward capturing every intermediate, write ``--out``, and — when
``--reference`` (produced by tools/export_reference_activations.py on the
TF side, fed the SAME ``--out`` file for inputs) is given — assert per-layer
allclose and print the per-layer max-abs report.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="reference TF1 checkpoint prefix (…/net-300000)")
    ap.add_argument("--mesh", required=True, help="input .obj mesh")
    ap.add_argument("--out", required=True, help="our activations npz")
    ap.add_argument("--reference", default=None,
                    help="reference activations npz to compare against")
    ap.add_argument("--atol", type=float, default=1e-4)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from facet_graph_convolution_tpu.config import default_config
    from facet_graph_convolution_tpu.data.dataset import InferenceMesh
    from facet_graph_convolution_tpu.evaluation.parity import (
        compare_activations,
        export_activations,
    )
    from facet_graph_convolution_tpu.evaluation.tf_checkpoint import (
        load_reference_unet,
    )
    from facet_graph_convolution_tpu.geometry.obj_io import load_obj

    params, multi_scale = load_reference_unet(args.checkpoint)
    print(f"imported reference checkpoint ({'multi-scale' if multi_scale else 'single-scale'})")

    cfg = default_config()
    vertices, faces, _ = load_obj(args.mesh)
    ds = InferenceMesh(
        max_patch_size=cfg.data.max_patch_size,
        min_patch_size=cfg.data.min_patch_size,
        coarsening_steps=cfg.model.coarsening_steps,
        coarsening_levels=cfg.model.coarsening_levels,
        k_faces=cfg.data.k_faces, seed=0,
    )
    ds.add_mesh(vertices, faces)
    patch = ds.patches[0]
    x = jnp.asarray(patch.inputs)
    adjs = tuple(jnp.asarray(a) for a in patch.adjs)

    acts = export_activations(args.out, params, x, adjs)
    print(f"wrote {args.out}: {sorted(acts)}")

    if args.reference:
        report = compare_activations(args.out, args.reference, atol=args.atol)
        print(json.dumps({"parity": "PASS",
                          "max_abs_diff": max(report.values()),
                          "layers": report}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
