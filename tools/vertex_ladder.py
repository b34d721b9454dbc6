"""Vertex-solver ladder experiments (BASELINE.md round-4 vertex section).

Measures the end-to-end vertex training step (multiScale forward →
120-iteration multi-scale solver → sampled chamfer, gradients through the
solver — reference ``trainAccuracyNet``, train.py:636-914) under solver
variants, using exactly the bench program (``bench.build_vertex_runner``):

    python tools/vertex_ladder.py --mode current [--subdiv 4]
    python tools/vertex_ladder.py --mode vector_gather   # pre-2f11aaf body
    python tools/vertex_ladder.py --mode unroll4         # fori_loop unroll
    python tools/vertex_ladder.py --mode operator        # linear-operator SpMV

Each prints one JSON line {mode, nodes, vertices, median_step_ms}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _patch_vector_gather():
    """Reinstate the pre-scalar-gather solver body (commit 2f11aaf's
    predecessor): gathers the [V, K, 3] face-center tensor per iteration."""
    from typing import List, Sequence, Tuple

    import jax
    import jax.numpy as jnp

    from facet_graph_convolution_tpu.ops.normalization import dot_last
    from facet_graph_convolution_tpu.ops import vertex_update as vu

    def update_positions_multiscale(x, face_normals_list, faces, v_faces,
                                    coarsening_steps=2, iter_nums=(80, 20, 20),
                                    checkpoint=True):
        levels = len(face_normals_list)
        real = v_faces >= 0
        num_f = jnp.sum(real.astype(x.dtype), axis=-1)
        lmbd = jnp.where(num_f > 0, 1.0 / jnp.maximum(num_f, 1.0), 0.0)[:, None]
        dx_list = []
        for s in range(levels):
            cur_scale = levels - 1 - s
            fn = face_normals_list[cur_scale].reshape(-1, 3)
            fn_pad = jnp.concatenate([jnp.zeros((1, 3), fn.dtype), fn], axis=0)
            vf = (v_faces // (2 ** coarsening_steps) ** cur_scale) + 1
            v_fn = jnp.take(fn_pad, vf, axis=0)

            def body(_, x, vf=vf, v_fn=v_fn, cur_scale=cur_scale):
                fpos = vu.face_centers_pyramid(
                    x, faces, coarsening_steps, levels)[cur_scale]
                fpos_pad = jnp.concatenate(
                    [jnp.zeros((1, 3), fpos.dtype), fpos], axis=0)
                v_c = jnp.take(fpos_pad, vf, axis=0)
                e = v_c - x[:, None, :]
                n_w = dot_last(v_fn, e)
                update = jnp.sum(n_w[..., None] * v_fn, axis=1)
                return x + lmbd * update

            x_init = x
            if checkpoint:
                body = jax.checkpoint(body)
            x = jax.lax.fori_loop(0, int(iter_nums[s]), body, x)
            dx_list.append(x - x_init)
        return x, dx_list

    _install(update_positions_multiscale)


def _patch_unroll(n):
    import functools

    from facet_graph_convolution_tpu.ops import vertex_update as vu

    _install(functools.partial(vu.update_positions_multiscale, unroll=n))


def _patch_no_face_tables():
    """Round-4 operator body: solver tables WITHOUT the per-scale
    face→vertex incidence (A_s·x) pack, so the body recomputes the center
    pyramid per iteration — the A/B partner of the round-5 default."""
    from facet_graph_convolution_tpu.ops.vertex_update import (
        build_solver_tables,
    )
    from facet_graph_convolution_tpu.training import trainer

    def tables(cfg, p):
        return build_solver_tables(
            p.v_faces, [a.shape[0] for a in p.adjs], p.vertices.shape[0],
            coarsening_steps=cfg.model.coarsening_steps,
        )

    trainer._solver_tables = tables


def _patch_operator_unroll(n):
    """Operator body with fori_loop unroll=n: with solver_remat=False (the
    round-4 default) the scan lowering's pathological remat transposition
    no longer applies, so cross-iteration elementwise fusion is worth
    re-measuring on the op-count-bound step."""
    import functools

    from facet_graph_convolution_tpu.ops import vertex_update as vu

    orig = vu.update_positions_multiscale_operator
    vu.update_positions_multiscale_operator = functools.partial(
        orig, unroll=n)


def _install(solver):
    """Point every consumer of the multiscale solver at ``solver``."""
    from facet_graph_convolution_tpu.ops import vertex_update as vu
    from facet_graph_convolution_tpu.training import trainer

    vu.update_positions_multiscale = solver
    trainer.update_positions_multiscale = solver


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="current",
                   choices=("current", "naive", "vector_gather", "unroll4",
                            "operator", "operator_pyramid",
                            "operator_unroll4"))
    p.add_argument("--subdiv", type=int, default=4)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    solver = ("operator" if args.mode.startswith("operator") else "naive")
    if args.mode == "vector_gather":
        _patch_vector_gather()
    elif args.mode == "unroll4":
        _patch_unroll(4)
    elif args.mode == "operator_pyramid":
        _patch_no_face_tables()
    elif args.mode == "operator_unroll4":
        _patch_operator_unroll(4)

    import bench

    run, run_args, info = bench.build_vertex_runner(
        steps=args.steps, subdiv=args.subdiv, bf16=True, solver=solver)
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        state, losses = run(*run_args)
        _ = float(losses[-1])
        times.append((time.perf_counter() - t0) / args.steps)
    times.sort()
    print(json.dumps({
        "mode": args.mode,
        "nodes": info["nodes"],
        "vertices": info["vertices"],
        "median_step_ms": round(times[len(times) // 2] * 1e3, 2),
        "final_loss": round(float(losses[-1]), 3),
    }))


if __name__ == "__main__":
    main()
