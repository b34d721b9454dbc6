"""Self-contained (jax-only) distillation of the round-4 remat NaN miscompile.

The framework-level repro (tools/repro_vertex_nan.py) demonstrates the bug
through the full vertex training step; this script reconstructs ONLY the
bisected trigger composition, with zero framework imports, so the evidence
survives framework refactors and jax upgrades and can be filed upstream:

    jax.checkpoint (default prevent_cse=True barriers)
      around the body of a lax.fori_loop (~120 iterations total)
        whose body calls a custom-VJP lane-axis gather
          (backward = gather over a transposed slot map + validity mask)
    under jax.value_and_grad, at reference scale (V ≈ 10k, F ≈ 25k)

Observed on jax 0.9.0 / TPU v5e AND CPU (round 4): the fused
value_and_grad program returns all-NaN parameter gradients from provably
finite inputs; any change to the compiled program (probes, staging, loss
swap) flips the behavior while value-identical source edits do not. On CPU
``prevent_cse=False`` on the checkpoint cures it; on TPU only removing
remat does.

IMPORTANT caveat recorded with the bug: the failure is a compiled-program
razor — it appeared in the full training step (U-Net forward + solver +
chamfer). A minimal distillation is NOT guaranteed to tickle the same
scheduling path; this script reports which of its four configurations
produce NaN so each jax upgrade gets a dated data point either way:

    python tools/repro_remat_nan_standalone.py            # all 4 configs
    python tools/repro_remat_nan_standalone.py --v 10242  # scale override

Exit code 0 always (it is a probe, not a test); the JSON line per config is
the artifact. Configurations: remat ∈ {off, on(default barriers),
on(prevent_cse=False)} × gather ∈ {custom-vjp, plain take}.
"""

import argparse
import json
from functools import partial

import numpy as np


def build_tables(v, f, k, seed=0):
    """Random one-indexed incidence [K, V] into F sources + its transposed
    flat slot map [S, F] (the lane-gather backward table): the same table
    SHAPES the solver uses, without any mesh machinery."""
    rng = np.random.default_rng(seed)
    adj = rng.integers(1, f + 1, size=(v, k)).astype(np.int32)
    adj[rng.random((v, k)) < 0.3] = 0                       # padding slots
    # transpose: for each source row, the flat k*V + n slots that read it
    slots = [[] for _ in range(f)]
    for n in range(v):
        for kk in range(k):
            a = adj[n, kk]
            if a > 0:
                slots[a - 1].append(kk * v + n + 1)         # one-indexed
    s = max(1, max(len(x) for x in slots))
    adj_t = np.zeros((f, s), np.int32)
    for i, x in enumerate(slots):
        adj_t[i, : len(x)] = x
    return np.ascontiguousarray(adj.T), np.ascontiguousarray(adj_t.T)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=10242)
    ap.add_argument("--f", type=int, default=25136)
    ap.add_argument("--k", type=int, default=13)
    ap.add_argument("--iters", type=int, nargs=3, default=(80, 20, 20))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    @partial(jax.custom_vjp)
    def gather_lane(x_t, adjT, adjT_t):
        pad = jnp.concatenate([jnp.zeros_like(x_t[:, :1]), x_t], axis=1)
        return jnp.take(pad, adjT, axis=1)                  # [C, K, V]

    def _fwd(x_t, adjT, adjT_t):
        return gather_lane(x_t, adjT, adjT_t), (adjT_t,)

    def _bwd(res, g):
        (adjT_t,) = res
        c = g.shape[0]
        g_flat = g.reshape(c, -1)
        idx = jnp.maximum(adjT_t - 1, 0)
        valid = (adjT_t > 0).astype(g_flat.dtype)
        dx = jnp.sum(jnp.take(g_flat, idx, axis=1) * valid[None], axis=1)
        return dx, None, None

    gather_lane.defvjp(_fwd, _bwd)

    v, f, k = args.v, args.f, args.k
    adjT_np, adjT_t_np = build_tables(v, f, k)
    adjT = jnp.asarray(adjT_np)
    adjT_t = jnp.asarray(adjT_t_np)
    # face→vertex map for the per-iteration "center" recomputation analogue
    fv_np, fv_t_np = build_tables(f, v, 3, seed=1)
    fvT = jnp.asarray(fv_np)
    fvT_t = jnp.asarray(fv_t_np)

    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.standard_normal((3, v)).astype(np.float32) * 0.1)
    feats = jnp.asarray(rng.standard_normal((8, f)).astype(np.float32))
    w0 = jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32) * 0.1)

    def run(w, remat, prevent_cse, custom):
        gl = gather_lane if custom else (
            lambda x_t, a, at: jnp.take(
                jnp.concatenate([jnp.zeros_like(x_t[:, :1]), x_t], axis=1),
                a, axis=1))
        fn_t = w @ feats                                    # [3, F] "normals"
        fn_t = fn_t / (jnp.linalg.norm(fn_t, axis=0, keepdims=True) + 1e-6)
        n_vu = gl(fn_t, adjT, adjT_t)                       # [3, K, V]
        p_t = jnp.einsum("akv,bkv->abv", n_vu, n_vu)
        lmbd = 1.0 / k

        def body(_, x_t):
            c_f = jnp.sum(gl(x_t, fvT, fvT_t), axis=1) / 3.0    # [3, F]
            t = jnp.sum(fn_t * c_f, axis=0)                 # [F]
            t_vu = gl(t[None], adjT, adjT_t)[0]             # [K, V]
            term1 = jnp.sum(t_vu[None] * n_vu, axis=1)
            px = jnp.einsum("abv,bv->av", p_t, x_t)
            return x_t + lmbd * 0.1 * (term1 - px)

        if remat:
            body = jax.checkpoint(body, prevent_cse=prevent_cse)
        x_t = x0
        for it in args.iters:
            x_t = jax.lax.fori_loop(0, it, body, x_t)
        return jnp.sum(jnp.sin(x_t))

    for custom in (True, False):
        for remat, pcse in ((False, True), (True, True), (True, False)):
            loss, g = jax.jit(jax.value_and_grad(
                lambda w: run(w, remat, pcse, custom)))(w0)
            g = np.asarray(g)
            print(json.dumps({
                "jax": jax.__version__,
                "backend": jax.default_backend(),
                "gather": "custom_vjp" if custom else "take",
                "remat": remat,
                "prevent_cse": pcse,
                "loss_finite": bool(np.isfinite(float(loss))),
                "grads_nan_frac": round(float(np.mean(~np.isfinite(g))), 4),
                "verdict": ("REPRO" if not np.all(np.isfinite(g))
                            else "no-nan"),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
