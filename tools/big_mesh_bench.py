"""Million-facet regime harness (BASELINE.md scaling row; SURVEY §7.2 step 6).

Generates a subdivided icosphere (subdiv 8 → 1,310,720 facets), runs the full
host pipeline — adjacency, coarsening pyramid, halo partitioning — with
per-stage wall-clock, then (optionally) jits the halo-sharded training step
over the visible devices and measures sustained edges/s.

    python tools/big_mesh_bench.py --subdiv 8 --shards 8 --prep_only   # host
    python tools/big_mesh_bench.py --subdiv 8 --train --steps 5        # TPU
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/big_mesh_bench.py --subdiv 7 --train              # mesh rig

Prints one JSON line per stage and a final summary JSON.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(stage, seconds, **kw):
    print(json.dumps({"stage": stage, "seconds": round(seconds, 2), **kw}),
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=8)
    ap.add_argument("--shape", choices=("icosphere", "torus"),
                    default="icosphere")
    ap.add_argument("--torus_nu", type=int, default=1024)
    ap.add_argument("--torus_nv", type=int, default=512)
    ap.add_argument("--shards", type=int, default=None)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--prep_only", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="checkpoint convs + fc head (required when the "
                         "per-shard node count exceeds the HBM-residual "
                         "regime, e.g. >=1M nodes on one chip)")
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler trace of one scanned "
                         "dispatch and print the per-op rollup "
                         "(tools/op_profile.summarize)")
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="run on N virtual CPU devices (the session "
                         "sitecustomize pins the axon TPU backend, so the "
                         "JAX_PLATFORMS env var alone is IGNORED — this "
                         "flag forces the platform via jax.config)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)
        try:
            import jax.extend.backend

            jax.extend.backend.clear_backends()
        except Exception:
            pass

    import numpy as np

    from facet_graph_convolution_tpu.data.synthetic import (
        add_vertex_noise,
        icosphere,
        torus,
    )

    t0 = time.time()
    if args.shape == "torus":
        # 2·nu·nv faces: nu=1024, nv=512 → 1,048,576 — the smallest ≥1M
        # config (the icosphere jumps 327k → 1.31M between subdivs; 1.59M
        # pyramid nodes measure a 15.56G program — past one v5e's HBM)
        v, f = torus(nu=args.torus_nu, nv=args.torus_nv)
    else:
        v, f = icosphere(args.subdiv)
    log(args.shape, time.time() - t0, faces=int(f.shape[0]))

    t0 = time.time()
    noisy = add_vertex_noise(v, f, 0.2, np.random.default_rng(0))
    log("noise", time.time() - t0)

    from facet_graph_convolution_tpu.data.dataset import (
        TrainingSet,
        bucket_size,
        pad_patch_to,
    )

    t0 = time.time()
    ds = TrainingSet(
        max_patch_size=10**9, coarsening_steps=2, coarsening_levels=3,
        k_faces=23, seed=0,
    )
    ds.add_mesh(noisy, f, gt_vertices=v)
    log("dataset_build", time.time() - t0,
        nodes=int(ds.patches[0].num_nodes))
    patch = ds.patches[0]

    import jax

    n_dev = args.shards or len(jax.devices())
    group = 16 * n_dev
    t0 = time.time()
    patch = pad_patch_to(patch, bucket_size(patch.num_nodes, max(1024, group)))
    log("pad", time.time() - t0, padded_nodes=int(patch.num_nodes))

    from facet_graph_convolution_tpu.parallel.halo import build_partition

    t0 = time.time()
    part = build_partition(patch.adjs, n_dev)
    prep_partition_s = time.time() - t0
    halo_frac = part.fine.halo_size * max(len(part.fine.offsets), 1) / part.fine.block
    log("build_partition", prep_partition_s, shards=n_dev,
        fine_block=int(part.fine.block),
        offsets=len(part.fine.offsets),
        halo_per_offset=int(part.fine.halo_size),
        halo_frac=round(float(halo_frac), 4))

    summary = {
        "metric": "big_mesh_partition_s",
        "faces": int(f.shape[0]),
        "shards": n_dev,
        "partition_seconds": round(prep_partition_s, 2),
    }

    if args.profile and not args.prep_only:
        args.train = True

    if args.train and not args.prep_only:
        import jax.numpy as jnp

        jax.config.update("jax_compilation_cache_dir", "/tmp/fgc_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

        from bench import count_edges
        from facet_graph_convolution_tpu.config import default_config
        from facet_graph_convolution_tpu.parallel.halo import (
            make_sharded_train_step,
        )
        from facet_graph_convolution_tpu.parallel.mesh import make_mesh
        from facet_graph_convolution_tpu.training.trainer import (
            create_train_state,
        )

        edges = count_edges(patch)
        mesh = make_mesh((1, n_dev), ("data", "graph"))
        cfg = default_config().replace(model={"compute_dtype": "bfloat16"})
        state, tx = create_train_state(jax.random.PRNGKey(0), cfg)
        step_fn = make_sharded_train_step(tx, cfg, part, mesh,
                                          remat=args.remat)

        # pre-place args under the step's expected shardings (see
        # bench.measure_sharded: unsharded args re-lay-out per dispatch)
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P("graph"))
        state = jax.device_put(state, NamedSharding(mesh, P()))
        x = jax.device_put(jnp.asarray(patch.inputs), shard)
        gt = jax.device_put(jnp.asarray(patch.gt_normals), shard)
        mask = np.zeros(patch.num_nodes, np.float32)
        mask[np.random.default_rng(0).integers(
            0, patch.num_nodes, size=cfg.train.loss_samples)] = 1.0
        mask = jax.device_put(jnp.asarray(mask), shard)

        @jax.jit
        def run_steps(state, x, gt, mask, ops):
            # ops as jit ARGS: closing over them would embed the graph
            # tables as HLO constants (see make_sharded_train_step.raw)
            def body(state, _):
                state, loss = step_fn.raw(state, x, gt, mask, None, ops)
                return state, loss

            return jax.lax.scan(body, state, None, length=args.steps)

        with mesh:
            t0 = time.time()
            state, losses = run_steps(state, x, gt, mask, step_fn.operands)
            _ = float(losses[-1])
            log("compile_and_first_run", time.time() - t0,
                loss=float(losses[-1]))
            if args.profile:
                from tools.op_profile import _capture, summarize

                xp = _capture(
                    lambda: run_steps(state, x, gt, mask, step_fn.operands),
                    (),
                )
                print(f"xplane: {xp}", flush=True)
                summarize(xp, args.steps, 40)
            times = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                state, losses = run_steps(state, x, gt, mask,
                                          step_fn.operands)
                _ = float(losses[-1])
                times.append((time.perf_counter() - t0) / args.steps)
        times.sort()
        median = times[len(times) // 2]
        summary.update({
            "metric": "big_mesh_sharded_edges_per_s",
            "edges_per_step": edges,
            "median_step_s": round(median, 4),
            "edges_per_s": round(edges / median, 1),
            "final_loss": float(losses[-1]),
            "platform": jax.default_backend(),
        })

    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
