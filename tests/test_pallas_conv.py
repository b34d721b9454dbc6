"""Fused Pallas conv epilogue: parity vs the reference-shaped conv.

Runs in interpret mode on CPU; the TPU measurement is recorded in
BASELINE.md (the kernel is a correct alternative backend but measured
slower than the node-minor XLA path end-to-end).
"""

import jax
import jax.numpy as jnp
import numpy as np

from facet_graph_convolution_tpu.graph.convert import dedupe_klist, split_self_klist
from facet_graph_convolution_tpu.ops.conv import FacetConvVariant, facet_conv, init_facet_conv
from facet_graph_convolution_tpu.ops.pallas_conv import (
    facet_conv_pallas,
    slot_major_arrays,
)


def _random_graph(rng, n=64, k=9):
    adj = np.zeros((n, k), np.int32)
    adj[:, 0] = np.arange(n) + 1
    for i in range(n):
        deg = int(rng.integers(0, k - 1))
        adj[i, 1:1 + deg] = rng.choice(n, size=deg, replace=True) + 1
    return adj


def test_pallas_conv_value_and_grad_parity(rng):
    adj = _random_graph(rng)
    n = adj.shape[0]
    adj_u, mult = dedupe_klist(adj)
    adj_n, mult_n, self_mult = split_self_klist(adj_u, mult)
    adj_sm, adj_t_sm, mult_rows = slot_major_arrays(adj_n, mult_n, self_mult)
    assert mult_rows.shape[1] % 8 == 0          # host-padded to a tileable N

    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    params = init_facet_conv(jax.random.PRNGKey(0), 6, 8, 4)

    def f_ref(p, x):
        return facet_conv(p, x, jnp.asarray(adj))

    def f_pl(p, x):
        return facet_conv_pallas(
            p, x, jnp.asarray(adj_sm), jnp.asarray(adj_t_sm),
            jnp.asarray(mult_rows), interpret=True,
        )

    np.testing.assert_allclose(
        np.asarray(f_ref(params, x)), np.asarray(f_pl(params, x)), atol=1e-5
    )

    def loss(f):
        return lambda p, x: jnp.sum(f(p, x) ** 2)

    g_ref = jax.grad(loss(f_ref), argnums=(0, 1))(params, x)
    g_pl = jax.grad(loss(f_pl), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pallas_conv_translation_invariant(rng):
    adj = _random_graph(rng, n=40, k=7)
    adj_u, mult = dedupe_klist(adj)
    adj_n, mult_n, self_mult = split_self_klist(adj_u, mult)
    adj_sm, adj_t_sm, mult_rows = slot_major_arrays(adj_n, mult_n, self_mult)
    x = jnp.asarray(rng.normal(size=(40, 6)).astype(np.float32))
    params = init_facet_conv(
        jax.random.PRNGKey(1), 6, 8, 4,
        variant=FacetConvVariant.TRANSLATION_INVARIANT,
    )
    y_ref = facet_conv(params, x, jnp.asarray(adj),
                       variant=FacetConvVariant.TRANSLATION_INVARIANT)
    y_pl = facet_conv_pallas(
        params, x, jnp.asarray(adj_sm), jnp.asarray(adj_t_sm),
        jnp.asarray(mult_rows), translation_invariant=True, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_pl), atol=1e-5)


def test_pallas_train_step_parity(rng, monkeypatch):
    """Full train step on the pallas arrays matches the row-major arrays."""
    import facet_graph_convolution_tpu.ops.pallas_conv as pc
    from __graft_entry__ import _make_patch
    from facet_graph_convolution_tpu.config import default_config
    from facet_graph_convolution_tpu.training.trainer import (
        _patch_arrays,
        create_train_state,
        make_normals_train_step,
    )

    orig = pc.facet_conv_pallas
    monkeypatch.setattr(
        pc, "facet_conv_pallas",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )

    patch = _make_patch(subdiv=3, seed=3)
    cfg = default_config()
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_normals_train_step(tx, cfg)
    key = jax.random.PRNGKey(7)
    losses = []
    for kw in (dict(nminor=False), dict(pallas=True)):
        x, adjs, gt, adj_ts, mults = _patch_arrays(patch, **kw)
        _, loss = step(state, x, adjs, gt, key, adj_ts, mults)
        losses.append(float(loss))
    assert abs(losses[0] - losses[1]) < 1e-3, losses
