"""Multi-host launcher: one command per host runs sharded training/bench.

The pod one-liner (per host; on TPU pods all bootstrap args autodetect):

    python -m facet_graph_convolution_tpu.parallel.launch bench

CPU test rig (N processes on one machine, gloo collectives):

    python -m facet_graph_convolution_tpu.parallel.launch \
        --coordinator 127.0.0.1:9981 --num_processes 2 --process_id 0 \
        --cpu_devices 2 train --iterations 40

Every process runs this module with the same arguments (different
``--process_id``); host-side RNG is seed-deterministic so processes stay in
lockstep. The edge-partitioned mesh is host-aware: intra-host halo hops ride
per-offset ``ppermute`` rings (ICI), cross-host rows batch into one
``all_to_all`` per conv layer (DCN) — parallel/halo.build_partition
``devices_per_host``. The reference has no distributed execution of any kind
(SURVEY.md §2.7); this subsystem is the framework's own.
"""

from __future__ import annotations

import argparse
import json
import time


def _build_patch(subdiv: int, seed: int):
    """Deterministic synthetic whole-mesh patch (noisy icosphere + GT)."""
    import numpy as np

    from facet_graph_convolution_tpu.config import default_config
    from facet_graph_convolution_tpu.data.dataset import TrainingSet
    from facet_graph_convolution_tpu.data.synthetic import (
        add_vertex_noise,
        icosphere,
    )

    cfg = default_config()
    v, f = icosphere(subdiv)
    noisy = add_vertex_noise(v, f, 0.15, np.random.default_rng(seed))
    ds = TrainingSet(
        max_patch_size=10**9, coarsening_steps=cfg.model.coarsening_steps,
        coarsening_levels=cfg.model.coarsening_levels,
        k_faces=cfg.data.k_faces, seed=seed,
    )
    ds.add_mesh(noisy, f, gt_vertices=v)
    return cfg, ds.patches[0]


def count_partition_edges(part) -> int:
    """Non-zero conv slots across the pyramid × convs per level (matching
    bench.py's count on the deduped partition: multiplicities ≥ 1 each count
    once per original slot)."""
    import numpy as np

    convs_per_level = (3, 3, 2)
    total = 0
    for lvl, n_convs in zip(part.levels, convs_per_level):
        total += int(lvl.mult.sum() + lvl.self_mult.sum()) * n_convs
    return total


def run(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--cpu_devices", type=int, default=None,
                        help="CPU test rig: virtual devices per process")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_train = sub.add_parser("train", help="sharded training on a synthetic mesh")
    p_train.add_argument("--iterations", type=int, default=40)
    p_train.add_argument("--subdiv", type=int, default=3)
    p_train.add_argument("--seed", type=int, default=0)
    p_train.add_argument("--checkpoint_dir", default=None)
    p_bench = sub.add_parser("bench", help="sharded train-step throughput")
    p_bench.add_argument("--steps", type=int, default=10)
    p_bench.add_argument("--repeats", type=int, default=3)
    p_bench.add_argument("--subdiv", type=int, default=5)
    args = parser.parse_args(argv)

    from facet_graph_convolution_tpu.parallel import distributed

    pidx, pcount = distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
        cpu_devices_per_process=args.cpu_devices,
    )

    import jax

    mesh = distributed.make_multihost_mesh()
    print(f"[launch] process {pidx}/{pcount}, mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}, "
          f"{jax.local_device_count()} local / {len(jax.devices())} global devices",
          flush=True)

    if args.cmd == "train":
        cfg, patch = _build_patch(args.subdiv, args.seed)
        cfg = cfg.replace(train={"loss_samples": min(2000, patch.num_nodes)})
        if args.checkpoint_dir:
            cfg = cfg.replace(train={"network_path": args.checkpoint_dir})
        from facet_graph_convolution_tpu.parallel.halo import train_normals_sharded

        state, losses = train_normals_sharded(
            cfg, patch, mesh, args.iterations, seed=args.seed,
            log_every=10, checkpoint=bool(args.checkpoint_dir),
        )
        print(json.dumps({
            "metric": "sharded_final_loss",
            "first_loss": round(float(losses[0]), 4),
            "value": round(float(losses[-1]), 4),
            "process": pidx,
        }), flush=True)
        return 0

    # bench: sustained sharded step throughput
    import jax.numpy as jnp
    import numpy as np

    from facet_graph_convolution_tpu.parallel.halo import (
        make_sharded_train_step,
        _prepare_sharded_mesh_arrays,
    )
    from facet_graph_convolution_tpu.training.trainer import create_train_state

    cfg, patch = _build_patch(args.subdiv, 0)
    cfg = cfg.replace(model={"compute_dtype": "bfloat16"},
                      train={"loss_samples": min(4000, patch.num_nodes)})
    part, x, gt, n, stage = _prepare_sharded_mesh_arrays(cfg, patch, mesh, "graph")
    edges = count_partition_edges(part)
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    if pcount > 1:
        state = distributed.replicate(mesh, state)
    step = make_sharded_train_step(tx, cfg, part, mesh)

    mask = np.zeros(n, np.float32)
    mask[np.random.default_rng(0).integers(0, n, size=cfg.train.loss_samples)] = 1.0
    mask = stage(mask)
    with mesh:
        state, loss = step(state, x, gt, mask)      # compile + warmup
        _ = float(loss)
        times = []
        for _r in range(args.repeats):
            t0 = time.perf_counter()
            for _s in range(args.steps):
                state, loss = step(state, x, gt, mask)
            _ = float(loss)
            times.append((time.perf_counter() - t0) / args.steps)
    times.sort()
    median = times[len(times) // 2]
    print(json.dumps({
        "metric": "sharded_train_step_edges_per_s",
        "value": round(edges / median, 1),
        "unit": "edges/s",
        "step_s": round(median, 5),
        "edges_per_step": edges,
        "devices": len(jax.devices()),
        "processes": pcount,
        "process": pidx,
        "final_loss": round(float(loss), 4),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(run())
