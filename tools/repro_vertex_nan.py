"""Repro: deterministic NaN gradients from the remat-barrier composition.

Before the ``prevent_cse=False`` fix (ops/vertex_update.py), the end-to-end
vertex training step at reference scale (icosphere-5: 20,480 true faces,
25,136 padded nodes, 10,242 vertices) produced ALL-NaN parameter gradients
from finite inputs — deterministically per compiled program, on BOTH the CPU
and TPU backends — whenever the 120-iteration operator solver's
``jax.checkpoint`` bodies used the default ``prevent_cse=True`` barriers
together with the custom-VJP lane gather. Evidence trail (BASELINE.md round
4): the forward was provably finite (max|refined| ≈ 0.297, loss ≈ 29.9),
every staged cotangent interface was finite, the backward contains no
NaN-capable op in exact arithmetic, and the NaN vanished under ANY of:
removing the barriers (prevent_cse=False), removing remat entirely, swapping
the custom-VJP gather for a take-based one, or attaching any probe to the
program — an XLA miscompile signature, not a math bug.

On CPU ``prevent_cse=False`` alone cured it; the TPU compile still NaN'd
until remat was dropped entirely, so the shipped default is
``EvalConfig.solver_remat = False`` (the solver bodies keep
``prevent_cse=False`` for when remat is explicitly enabled).

The same razor made training COLLAPSE SILENTLY rather than abort: the
reference-semantics chamfer threshold ``where(dist <= thr, dist, 0)`` maps
the NaN distances of a poisoned state to 0, so the loss becomes a plausible
0.0 and the drivers' NaN-abort guards never fire. The thresholds are now
NaN-transparent (models/losses.py:_threshold).

Run on either backend (CPU takes a few minutes to compile):

    JAX_PLATFORMS=cpu python tools/repro_vertex_nan.py

Prints the 10-step loss trajectory and whether the final state is finite.
Healthy output: finite, slowly moving losses. The pre-fix failure mode:
step-0 grads NaN -> every later loss exactly 0.0.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    import bench
    from facet_graph_convolution_tpu.config import default_config
    from facet_graph_convolution_tpu.training.trainer import create_train_state

    run, args, info = bench.build_vertex_runner(
        steps=10, subdiv=5, bf16=True, solver="operator")
    _state_warm, patch_args, keys = args
    cfg = default_config().replace(
        model={"compute_dtype": "bfloat16"}).replace(
        eval={"vertex_solver": "operator"})
    state, _tx = create_train_state(jax.random.PRNGKey(0), cfg,
                                    multi_scale=True)
    st, losses = run(state, patch_args, keys)
    finite = all(bool(jnp.all(jnp.isfinite(l)))
                 for l in jtu.tree_leaves(st.params))
    print("losses:", [round(float(l), 3) for l in losses])
    print("final params finite:", finite)
    if not finite or any(float(l) == 0.0 for l in losses):
        print("FAIL: the remat-barrier NaN razor is back")
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
