"""A/B: sharded multi-scale vertex solver bodies (VERDICT r4 item 3).

Measures the graph-parallel end-to-end vertex training step (multiScale
halo forward → sharded 120-iteration solver → sharded chamfer) under the
two solver bodies on the virtual-device CPU mesh, and prints per-iteration
halo-byte accounting for both from the partition tables:

    python tools/sharded_vertex_ab.py --devices 8 --subdiv 3

- ``naive``     — round-3 scalar-gather body: per-iteration fine-corner
  gather + avg_ignore_zeros pool chain + t-exchange over the raw [V, 25]
  incidence (parallel.vertex_halo.multiscale_solver_local);
- ``operator``  — round-5 port of the single-chip linear-operator body:
  deduped incidence, static A_s center operator, hoisted projector
  (multiscale_solver_local_operator).

CPU-mesh wall-clock is a PROXY (collective costs differ on ICI), so the
halo-byte table is printed alongside: bytes ride the interconnect on real
hardware and are methodology-independent.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def halo_bytes_naive(sop, iter_nums, levels=3):
    """Per-STEP exchanged bytes (f32) of the naive body: every iteration at
    scale s exchanges (a) vertex positions over the FINE fv tables ([H, 3])
    and (b) t scalars over the raw vf tables of that scale ([H, 1])."""
    per_scale = []
    fv_rows = int(sop.fv_send.shape[1] * sop.fv_send.shape[2])
    for s, iters in zip(range(levels - 1, -1, -1), iter_nums):
        vf_rows = int(sop.vf_sends[s].shape[1] * sop.vf_sends[s].shape[2])
        per_iter = 4 * (fv_rows * 3 + vf_rows * 1)
        per_scale.append(per_iter * int(iters))
    return sum(per_scale)


def halo_bytes_operator(sop, iter_nums, levels=3):
    """Operator body: per iteration at scale s, (a) vertex positions over
    the scale-s fc tables ([H, 3]) and (b) t scalars over the DEDUPED vfu
    tables ([H, 1]); plus once per scale, normals [H, 3] over vfu."""
    total = 0
    for s, iters in zip(range(levels - 1, -1, -1), iter_nums):
        fc_rows = int(sop.fc_sends[s].shape[1] * sop.fc_sends[s].shape[2])
        vfu_rows = int(sop.vfu_sends[s].shape[1] * sop.vfu_sends[s].shape[2])
        total += 4 * (fc_rows * 3 + vfu_rows * 1) * int(iters)
        total += 4 * vfu_rows * 3                 # loop-invariant normals
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--subdiv", type=int, default=3)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices)
    jax.config.update("jax_compilation_cache_dir", "/tmp/fgc_jax_cache")

    import jax.numpy as jnp
    import numpy as np

    from facet_graph_convolution_tpu.config import default_config
    from facet_graph_convolution_tpu.data.dataset import TrainingSet
    from facet_graph_convolution_tpu.data.synthetic import (
        add_vertex_noise,
        icosphere,
    )
    from facet_graph_convolution_tpu.parallel.mesh import make_mesh
    from facet_graph_convolution_tpu.parallel.vertex_train import (
        make_sharded_vertex_train_step,
        prepare_vertex_training,
    )
    from facet_graph_convolution_tpu.training.trainer import create_train_state

    v, f = icosphere(args.subdiv)
    noisy = add_vertex_noise(v, f, 0.15, np.random.default_rng(0))
    ds = TrainingSet(max_patch_size=10**9, coarsening_steps=2,
                     coarsening_levels=3, k_faces=23, seed=0)
    ds.add_mesh_with_vertices(noisy, f, gt_vertices=v)
    patch = ds.patches[0]
    mesh = make_mesh((1, args.devices), ("data", "graph"))
    iter_nums = default_config().eval.ms_solver_iterations

    for solver in ("naive", "operator"):
        cfg = default_config().replace(eval={"vertex_solver": solver})
        arrays, conv_part, sop = prepare_vertex_training(patch, cfg,
                                                         args.devices)
        state, tx = create_train_state(jax.random.PRNGKey(0), cfg,
                                       multi_scale=True)
        step = make_sharded_vertex_train_step(
            tx, cfg, conv_part, sop, mesh, augment=False)
        rng = np.random.default_rng(1)
        idx0 = jnp.asarray(rng.integers(0, arrays["num_vertices"], 500))
        idx1 = jnp.asarray(rng.integers(0, arrays["num_gt"], 500))
        key = jax.random.PRNGKey(2)
        with mesh:
            st, loss = step(state, arrays, idx0, idx1, key)  # compile+warm
            _ = float(loss)
            times = []
            for _ in range(args.repeats):
                st2 = state
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    st2, loss = step(st2, arrays, idx0, idx1, key)
                _ = float(loss)
                times.append((time.perf_counter() - t0) / args.steps)
        times.sort()
        hb = (halo_bytes_operator(sop, iter_nums) if solver == "operator"
              else halo_bytes_naive(sop, iter_nums))
        print(json.dumps({
            "solver": solver,
            "devices": args.devices,
            "nodes": int(patch.num_nodes),
            "vertices": int(patch.vertices.shape[0]),
            "median_step_ms": round(times[len(times) // 2] * 1e3, 2),
            "halo_bytes_per_step_per_shard": hb,
            "final_loss": round(float(loss), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
