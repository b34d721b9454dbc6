"""Benchmark: facet-graph U-Net training-step throughput in edges/s/chip.

Metric: one full jitted training step (forward + backward + Adam) on a
~20k-face patch; edges = Σ over the 8 graph convolutions of the non-zero
adjacency entries at that conv's pyramid level — the SpMM-equivalent work the
step performs (fwd+bwd share the count; the step includes both).

Prints ONE JSON line:
  {"metric": "train_step_edges_per_s", "value": N, "unit": "edges/s",
   "vs_baseline": R}
where R = value / CPU-baseline edges/s recorded in BASELINE_CPU.json
(north-star target: ≥ 10×, BASELINE.md).

Run with the default platform (TPU under the driver); pass --cpu to measure
and refresh the CPU baseline file.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_CPU.json")
VERTEX_BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "BASELINE_VERTEX_CPU.json")


def build_bench_patch(subdiv=5, seed=0):
    from __graft_entry__ import _make_patch

    return _make_patch(subdiv=subdiv, seed=seed)


def count_edges(patch) -> int:
    """Non-zero adjacency entries per conv, summed over the U-Net's convs:
    3 convs at level 0, 3 at level 1, 2 at level 2 (models/unet.py)."""
    import numpy as np

    convs_per_level = (3, 3, 2)
    total = 0
    for adj, n_convs in zip(patch.adjs, convs_per_level):
        total += int(np.count_nonzero(adj)) * n_convs
    return total


def build_step_runner(steps=20, subdiv=5, bf16=True, lane=True):
    """Build + compile + warm the benchmark training program: a jitted
    ``steps``-long ``lax.scan`` over the full train step. Returns
    ``(run_steps, args, info)`` — shared by :func:`measure` and
    ``tools/op_profile.py``, so the profiler always profiles exactly the
    program the benchmark times."""
    import jax

    # cache compiles across bench runs (remote TPU compiles take minutes)
    jax.config.update("jax_compilation_cache_dir", "/tmp/fgc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from facet_graph_convolution_tpu.config import default_config
    from facet_graph_convolution_tpu.data.dataset import bucket_size, pad_patch_to
    from facet_graph_convolution_tpu.training.trainer import (
        _patch_arrays,
        create_train_state,
        make_normals_train_step,
    )

    patch = build_bench_patch(subdiv=subdiv)
    patch = pad_patch_to(patch, bucket_size(patch.num_nodes, 1024))
    edges = count_edges(patch)

    cfg = default_config()
    if bf16:
        cfg = cfg.replace(model={"compute_dtype": "bfloat16"})
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_normals_train_step(tx, cfg)  # (state, x, adjs, gt, key)

    x, adjs, gt, adj_ts, mults = _patch_arrays(patch, lane=lane)

    @jax.jit
    def run_steps(state, keys, x, adjs, gt, adj_ts, mults):
        def body(state, key):
            state, loss = step_fn(state, x, adjs, gt, key, adj_ts, mults)
            return state, loss

        return jax.lax.scan(body, state, keys)

    keys = jax.random.split(jax.random.PRNGKey(1), steps)
    args = (state, keys, x, adjs, gt, adj_ts, mults)
    state, losses = run_steps(*args)                        # compile+warmup
    _ = float(losses[-1])
    info = {"edges_per_step": edges, "nodes": patch.num_nodes}
    return run_steps, args, info


def measure(steps=20, repeats=3, subdiv=5, bf16=True, lane=True):
    # bf16 default matches build_step_runner and the production config the
    # CLI selects (the CLI still forces f32 for --cpu / --f32)
    """Sustained training throughput: `steps` full train steps run inside one
    jitted lax.scan (keys presplit on host), timed over `repeats` dispatches.
    This measures device throughput, not per-dispatch host/tunnel latency —
    and matches how the production loop batches steps."""
    import jax

    run_steps, args, info = build_step_runner(steps, subdiv, bf16, lane)
    edges = info["edges_per_step"]

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, losses = run_steps(*args)
        # block_until_ready does not reliably await on the axon tunnel;
        # force a value transfer to measure true completion
        _ = float(losses[-1])
        times.append((time.perf_counter() - t0) / steps)

    times.sort()
    median = times[len(times) // 2]
    return {
        "edges_per_step": edges,
        "nodes": info["nodes"],
        "median_step_s": median,
        "best_step_s": times[0],
        # repeat spread over the cold dispatches: (max−min)/median — ladder
        # steps claiming wins below this band are indistinguishable from run
        # noise (BENCH artifacts span ~±2% across identical configs)
        "spread_pct": 100.0 * (times[-1] - times[0]) / median,
        "edges_per_s": edges / median,
        "platform": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "final_loss": float(losses[-1]),
    }


def measure_sharded(steps=20, repeats=3, subdiv=5, num_shards=None):
    """Sharded (halo-exchange) training-step throughput over all visible
    devices — the scaling-efficiency harness (BASELINE.md ≥80% target).

    On the single real TPU chip this measures D=1 sharding overhead vs the
    plain step; on a CPU rig with virtual devices (or a pod) it measures
    D=N. Host-aware partitioning engages automatically under multi-process
    execution (see parallel/launch.py for the pod one-liner)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/fgc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from facet_graph_convolution_tpu.config import default_config
    from facet_graph_convolution_tpu.data.dataset import bucket_size, pad_patch_to
    from facet_graph_convolution_tpu.parallel.halo import (
        build_partition,
        make_sharded_train_step,
        partition_operands_nminor,
    )
    from facet_graph_convolution_tpu.parallel.mesh import make_mesh
    from facet_graph_convolution_tpu.training.trainer import create_train_state

    n_dev = num_shards or len(jax.devices())
    mesh = make_mesh((1, n_dev), ("data", "graph"))

    patch = build_bench_patch(subdiv=subdiv)
    group = 16 * n_dev
    patch = pad_patch_to(patch, bucket_size(patch.num_nodes, max(1024, group)))
    edges = count_edges(patch)

    cfg = default_config().replace(model={"compute_dtype": "bfloat16"})
    part = build_partition(patch.adjs, n_dev)
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_sharded_train_step(tx, cfg, part, mesh)

    # commit every argument under the jitted step's expected sharding ONCE —
    # unsharded args are re-laid-out per dispatch (host-mediated on the
    # tunnel-attached TPU; measured 6.6 s/step of overhead at 1.27M nodes)
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P("graph"))
    rep = NamedSharding(mesh, P())
    state = jax.device_put(state, rep)
    x = jax.device_put(jnp.asarray(patch.inputs), shard)
    gt = jax.device_put(jnp.asarray(patch.gt_normals), shard)
    mask = np.zeros(patch.num_nodes, np.float32)
    mask[np.random.default_rng(0).integers(
        0, patch.num_nodes, size=cfg.train.loss_samples)] = 1.0
    mask = jax.device_put(jnp.asarray(mask), shard)

    @jax.jit
    def run_steps(state, x, gt, mask, ops):
        # ops as jit ARGS — closing over the step would embed the graph
        # tables as HLO constants (see make_sharded_train_step.raw)
        def body(state, _):
            state, loss = step_fn.raw(state, x, gt, mask, None, ops)
            return state, loss

        return jax.lax.scan(body, state, None, length=steps)

    ops = step_fn.operands
    with mesh:
        state, losses = run_steps(state, x, gt, mask, ops)  # compile + warmup
        _ = float(losses[-1])
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            state, losses = run_steps(state, x, gt, mask, ops)
            _ = float(losses[-1])
            times.append((time.perf_counter() - t0) / steps)
    times.sort()
    median = times[len(times) // 2]
    return {
        "edges_per_step": edges,
        "nodes": patch.num_nodes,
        "median_step_s": median,
        "spread_pct": 100.0 * (times[-1] - times[0]) / median,
        "edges_per_s": edges / median,
        "devices": n_dev,
        "platform": jax.default_backend(),
        "final_loss": float(losses[-1]),
    }


def build_dp_runner(steps=20, subdiv=5, num_patches=1, selection="chunk"):
    """Build + compile + warm the DP scanned-step program (shared by
    :func:`measure_dp` and ``tools/op_profile.py --dp``). Returns
    ``(run, args, mesh, info)``; call ``run(*args)`` under ``with mesh``.

    ``selection="chunk"`` (default, the DP driver's default) pins each
    device's patch per chunk so the tables stay loop-invariant;
    ``"step"`` benches the per-step bank-selection variant."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/fgc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from facet_graph_convolution_tpu.config import default_config
    from facet_graph_convolution_tpu.parallel.data_parallel import (
        build_patch_bank,
        make_dp_chunk_runner,
        make_dp_scanned_step,
        make_dp_train_step,
    )
    from facet_graph_convolution_tpu.parallel.mesh import make_mesh
    from facet_graph_convolution_tpu.training.trainer import create_train_state

    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev, 1), ("data", "graph"))
    patches = [build_bench_patch(subdiv=subdiv, seed=i)
               for i in range(num_patches)]
    cfg = default_config().replace(model={"compute_dtype": "bfloat16"})
    bank = jax.tree.map(jnp.asarray, build_patch_bank(patches, cfg))
    edges = count_edges(patches[0]) * n_dev     # per step, summed over chips

    state, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    keys = jax.random.split(jax.random.PRNGKey(1), (steps, n_dev))
    if selection == "chunk":
        select, run = make_dp_chunk_runner(tx, cfg, mesh)
        with mesh:
            sel = select(bank, jnp.zeros((n_dev,), jnp.int32))
        args = (state, sel, keys)
    else:
        step_fn = make_dp_train_step(tx, cfg, mesh)
        run = make_dp_scanned_step(step_fn)
        idxs = jnp.zeros((steps, n_dev), jnp.int32)
        args = (state, bank, idxs, keys)
    with mesh:
        state, losses = run(*args)              # compile + warmup
        _ = float(losses[-1])
    info = {"edges_per_step": edges, "devices": n_dev}
    return run, args, mesh, info


def measure_dp(steps=20, repeats=3, subdiv=5, selection="chunk"):
    """Data-parallel step throughput per chip (scanned dispatch, full fast
    path): with B = device count, per-chip edges/s should match the plain
    single-chip step (VERDICT round-1 item 2 'done' criterion)."""
    import jax

    run, args, mesh, info = build_dp_runner(steps=steps, subdiv=subdiv,
                                            selection=selection)
    edges, n_dev = info["edges_per_step"], info["devices"]

    with mesh:
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            state, losses = run(*args)
            _ = float(losses[-1])
            times.append((time.perf_counter() - t0) / steps)
    times.sort()
    median = times[len(times) // 2]
    return {
        "edges_per_step": edges,
        "median_step_s": median,
        "spread_pct": 100.0 * (times[-1] - times[0]) / median,
        "edges_per_s": edges / median,
        "edges_per_s_per_chip": edges / median / n_dev,
        "devices": n_dev,
        "platform": jax.default_backend(),
        "final_loss": float(losses[-1]),
    }


def build_vertex_runner(steps=10, subdiv=4, bf16=True, solver=None):
    """Build + compile + warm the scanned end-to-end VERTEX training program
    (multiScale forward → 120-iteration multi-scale solver → sampled chamfer;
    reference ``trainAccuracyNet`` semantics, train.py:636-914). Shared by
    :func:`measure_vertex` and ``tools/op_profile.py --vertex`` so the
    profiler profiles exactly the program the benchmark times."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/fgc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from facet_graph_convolution_tpu.config import default_config
    from facet_graph_convolution_tpu.data.dataset import TrainingSet
    from facet_graph_convolution_tpu.data.synthetic import (
        add_vertex_noise,
        icosphere,
    )
    from facet_graph_convolution_tpu.training.trainer import (
        _graph_arrays,
        create_train_state,
        make_vertex_train_step,
    )

    v, f = icosphere(subdiv)
    noisy = add_vertex_noise(v, f, 0.15, np.random.default_rng(0))
    ds = TrainingSet(max_patch_size=10**9, coarsening_steps=2,
                     coarsening_levels=3, k_faces=23, seed=0)
    ds.add_mesh_with_vertices(noisy, f, gt_vertices=v)
    p = ds.patches[0]

    cfg = default_config()
    if bf16:
        cfg = cfg.replace(model={"compute_dtype": "bfloat16"})
    if solver is not None:
        cfg = cfg.replace(eval={"vertex_solver": solver})
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg,
                                   multi_scale=True)
    step_fn = make_vertex_train_step(tx, cfg)
    adjs, adj_ts, mults = _graph_arrays(p.adjs)
    patch_args = (
        jnp.asarray(p.inputs), adjs, jnp.asarray(p.vertices),
        jnp.asarray(p.gt_vertices), jnp.asarray(p.faces),
        jnp.asarray(p.v_faces),
        None if p.gt_normals is None else jnp.asarray(p.gt_normals),
        adj_ts, mults,
    )
    if cfg.eval.vertex_solver == "operator":
        from facet_graph_convolution_tpu.training.trainer import _solver_tables

        patch_args = patch_args + (_solver_tables(cfg, p),)
    keys = jax.random.split(jax.random.PRNGKey(1), steps)
    run = step_fn.scanned
    state, losses = run(state, patch_args, keys)         # compile + warmup
    _ = float(losses[-1])
    info = {
        "nodes": int(p.num_nodes),
        "vertices": int(p.vertices.shape[0]),
        "solver_iterations": int(sum(default_config().eval.ms_solver_iterations)),
    }
    return run, (state, patch_args, keys), info


def measure_vertex(steps=10, repeats=3, subdiv=4, bf16=True):
    """Sustained end-to-end vertex training step wall-clock (scan-dispatched,
    gradients through the full 120-iteration solver)."""
    import jax

    run, args, info = build_vertex_runner(steps=steps, subdiv=subdiv,
                                          bf16=bf16)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, losses = run(*args)
        _ = float(losses[-1])
        times.append((time.perf_counter() - t0) / steps)
    times.sort()
    median = times[len(times) // 2]
    return {
        "median_step_s": median,
        "best_step_s": times[0],
        "spread_pct": 100.0 * (times[-1] - times[0]) / median,
        "nodes": info["nodes"],
        "vertices": info["vertices"],
        "platform": jax.default_backend(),
        "final_loss": float(losses[-1]),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true",
                        help="measure on CPU and refresh BASELINE_CPU.json")
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--subdiv", type=int, default=5)
    parser.add_argument("--f32", action="store_true",
                        help="disable the default bf16 compute path")
    parser.add_argument("--no_lane", action="store_true",
                        help="disable the default lane-axis gather (A/B)")
    parser.add_argument("--sharded", action="store_true",
                        help="benchmark the halo-exchange sharded step over "
                             "all visible devices")
    parser.add_argument("--dp", action="store_true",
                        help="benchmark the data-parallel step (per-chip "
                             "edges/s; chunk-pinned patch selection, the "
                             "driver default)")
    parser.add_argument("--dp_step", action="store_true",
                        help="with --dp: per-STEP patch selection variant")
    parser.add_argument("--vertex", action="store_true",
                        help="benchmark the end-to-end vertex training step "
                             "(chamfer through the 120-iteration solver)")
    parser.add_argument("--vertex_subdiv", type=int, default=4,
                        help="icosphere subdivision for --vertex (5 = the "
                             "reference's ~20k-face patch regime)")
    parser.add_argument("--shards", type=int, default=None,
                        help="shard count for --sharded (default: all devices)")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.vertex:
        result = measure_vertex(steps=min(args.steps, 10),
                                subdiv=args.vertex_subdiv,
                                bf16=not args.f32 and not args.cpu)
        if args.cpu:
            with open(VERTEX_BASELINE_FILE, "w") as fh:
                json.dump(result, fh, indent=2)
            print(json.dumps({
                "metric": "vertex_train_step_ms_cpu",
                "value": round(result["median_step_s"] * 1e3, 2),
                "unit": "ms/step",
                "vs_baseline": 1.0,
            }))
            return
        baseline = None
        if os.path.isfile(VERTEX_BASELINE_FILE):
            with open(VERTEX_BASELINE_FILE) as fh:
                baseline = json.load(fh)
        # speedup over the methodology-matched CPU run of the same program —
        # only meaningful at the same mesh scale (--vertex_subdiv changes
        # `nodes`; comparing against a differently-sized baseline is not a
        # speedup, report -1.0 instead)
        vs = (baseline["median_step_s"] / result["median_step_s"]
              if baseline and baseline.get("nodes") == result["nodes"]
              else -1.0)
        print(json.dumps({
            "metric": "vertex_train_step_ms",
            "value": round(result["median_step_s"] * 1e3, 2),
            "unit": "ms/step",
            "vs_baseline": round(vs, 3),
            "nodes": result["nodes"],
            "vertices": result["vertices"],
            "spread_pct": round(result["spread_pct"], 2),
        }))
        return

    if args.dp:
        result = measure_dp(steps=args.steps, subdiv=args.subdiv,
                            selection="step" if args.dp_step else "chunk")
        baseline = None
        if os.path.isfile(BASELINE_FILE):
            with open(BASELINE_FILE) as fh:
                baseline = json.load(fh)
        vs = (result["edges_per_s_per_chip"] / baseline["edges_per_s"]
              if baseline else -1.0)
        print(json.dumps({
            "metric": "dp_train_step_edges_per_s_per_chip",
            "value": round(result["edges_per_s_per_chip"], 1),
            "unit": "edges/s",
            "vs_baseline": round(vs, 3),
            "devices": result["devices"],
            "spread_pct": round(result["spread_pct"], 2),
        }))
        return

    if args.sharded:
        result = measure_sharded(steps=args.steps, subdiv=args.subdiv,
                                 num_shards=args.shards)
        baseline = None
        if os.path.isfile(BASELINE_FILE):
            with open(BASELINE_FILE) as fh:
                baseline = json.load(fh)
        vs = result["edges_per_s"] / baseline["edges_per_s"] if baseline else -1.0
        print(json.dumps({
            "metric": "sharded_train_step_edges_per_s",
            "value": round(result["edges_per_s"], 1),
            "unit": "edges/s",
            "vs_baseline": round(vs, 3),
            "devices": result["devices"],
            "spread_pct": round(result["spread_pct"], 2),
        }))
        return

    # bf16 interiors with f32 accumulation is the production TPU config;
    # the CPU baseline stays f32 (bf16 is emulated and slow on CPU).
    bf16 = not args.f32 and not args.cpu
    result = measure(steps=args.steps, subdiv=args.subdiv, bf16=bf16,
                     lane=not args.no_lane)

    if args.cpu:
        with open(BASELINE_FILE, "w") as fh:
            json.dump(result, fh, indent=2)
        print(json.dumps({
            "metric": "train_step_edges_per_s_cpu",
            "value": result["edges_per_s"],
            "unit": "edges/s",
            "vs_baseline": 1.0,
        }))
        return

    baseline = None
    if os.path.isfile(BASELINE_FILE):
        with open(BASELINE_FILE) as fh:
            baseline = json.load(fh)
    vs = result["edges_per_s"] / baseline["edges_per_s"] if baseline else -1.0

    print(json.dumps({
        "metric": "train_step_edges_per_s",
        "value": round(result["edges_per_s"], 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 3),
        "spread_pct": round(result["spread_pct"], 2),
    }))


if __name__ == "__main__":
    main()
