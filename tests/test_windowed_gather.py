"""Windowed lane gather: exact parity with the flat lane gather (values on
valid slots, gradients everywhere) on banded (RCM-style) adjacencies,
including the overlap-tail slab and the builder's fallback conditions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facet_graph_convolution_tpu.graph.convert import (
    lane_tables,
    windowed_lane_tables,
)
from facet_graph_convolution_tpu.ops.gather import (
    gather_neighbors_lane,
    make_windowed_lane_gather,
)


def banded_klist(n, k, band, pad_frac=0.2, seed=0):
    """One-indexed neighbours-only K-list with |j - i| <= band, ~pad_frac
    padding slots (0)."""
    rng = np.random.default_rng(seed)
    base = np.arange(n)[:, None]
    off = rng.integers(-band, band + 1, size=(n, k))
    adj = np.clip(base + off, 0, n - 1) + 1
    adj[rng.random((n, k)) < pad_frac] = 0
    return adj.astype(np.int32)


@pytest.mark.parametrize("n,block", [(4096, 512), (4352, 512)])
def test_windowed_matches_flat(n, block):
    k, band, c = 7, 96, 5
    adj = banded_klist(n, k, band)
    wt = windowed_lane_tables(adj, block=block, align=64)
    assert wt is not None
    adjT, adjT_t = lane_tables(adj)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((c, n)).astype(np.float32))
    validF = jnp.asarray(adjT > 0)[None].astype(np.float32)

    gw = make_windowed_lane_gather(wt.geometry)
    wt_args = tuple(jnp.asarray(a) for a in wt.arrays)

    def flat_loss(x):
        g = gather_neighbors_lane(x, jnp.asarray(adjT), jnp.asarray(adjT_t),
                                  clamped=True)
        return jnp.sum((g * validF) ** 2), g * validF

    def win_loss(x):
        g = gw(x, *wt_args)
        return jnp.sum((g * validF) ** 2), g * validF

    (lf, gf), dxf = jax.value_and_grad(flat_loss, has_aux=True)(x)
    (lw, gx), dxw = jax.value_and_grad(win_loss, has_aux=True)(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lw), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dxf), np.asarray(dxw),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("n,block", [(4096, 512)])
def test_windowed_tail_matches_flat(n, block):
    """Halo-extended sources (D>1 levels): a K-list mixing banded owned
    entries with tail (halo) entries must match the flat lane gather over
    the extended array — values on valid slots AND the full [C, N+H]
    input cotangent (the tail part is what the halo exchange's autodiff
    routes back to owning shards)."""
    k, band, c, halo = 7, 96, 5, 160
    ext = n + halo
    adj = banded_klist(n, k, band)
    # rewrite ~10% of valid slots to tail entries (one-indexed n+1..ext)
    rng = np.random.default_rng(9)
    to_tail = (rng.random(adj.shape) < 0.1) & (adj > 0)
    adj = np.where(to_tail, rng.integers(n + 1, ext + 1, size=adj.shape),
                   adj).astype(np.int32)
    wt = windowed_lane_tables(adj, num_sources=ext, block=block, align=64)
    assert wt is not None and wt.has_tail
    adjT, adjT_t = lane_tables(adj, num_sources=ext)
    x = jnp.asarray(rng.standard_normal((c, ext)).astype(np.float32))
    validF = jnp.asarray(adjT > 0)[None].astype(np.float32)

    gw = make_windowed_lane_gather(wt.geometry)
    wt_args = tuple(jnp.asarray(a) for a in wt.arrays)

    def flat_loss(x):
        g = gather_neighbors_lane(x, jnp.asarray(adjT), jnp.asarray(adjT_t),
                                  clamped=True)
        return jnp.sum((g * validF) ** 2), g * validF

    def win_loss(x):
        g = gw(x, *wt_args)
        return jnp.sum((g * validF) ** 2), g * validF

    (lf, gf), dxf = jax.value_and_grad(flat_loss, has_aux=True)(x)
    (lw, gx), dxw = jax.value_and_grad(win_loss, has_aux=True)(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lw), rtol=1e-6)
    assert dxw.shape == (c, ext)
    np.testing.assert_allclose(np.asarray(dxf), np.asarray(dxw),
                               rtol=1e-6, atol=1e-6)


def test_builder_fallbacks():
    adj = banded_klist(4096, 7, 64)
    # too few blocks
    assert windowed_lane_tables(adj, block=4096) is None
    # halo-extended source builds the tail pack (round 5: D>1 windowing)
    wt = windowed_lane_tables(adj, num_sources=5000, block=512)
    assert wt is not None and wt.has_tail and len(wt.arrays) == 11
    # no locality: random adjacency blows the window ratio
    rng = np.random.default_rng(2)
    rand_adj = (rng.integers(0, 4096, size=(4096, 7)) + 1).astype(np.int32)
    assert windowed_lane_tables(rand_adj, block=256, align=64,
                                max_window_ratio=2.0) is None


def test_window_geometry_covers_all_valid_entries():
    n, k, band, block = 6144, 9, 200, 1024
    adj = banded_klist(n, k, band, seed=3)
    wt = windowed_lane_tables(adj, block=block, align=128)
    assert wt is not None
    adjT0 = np.maximum(adj.T.astype(np.int64) - 1, 0)
    valid = adj.T > 0
    for b, (os_, ws) in enumerate(zip(wt.out_starts, wt.win_starts)):
        cols = slice(int(os_), int(os_) + wt.block)
        sub, va = adjT0[:, cols], valid[:, cols]
        if va.any():
            assert sub[va].min() >= ws
            assert sub[va].max() < ws + wt.window
        # stored relT reproduces the global index on valid slots
        np.testing.assert_array_equal(
            (wt.relT[b] + ws)[wt.validF[b]], sub[va])


@pytest.mark.parametrize("fused,devices", [(True, 1), (False, 1), (True, 8),
                                           (False, 8)])
def test_windowed_sharded_step_matches_flat(monkeypatch, fused, devices):
    """Sharded train step with the windowed gather forced on must match the
    flat-gather step loss-for-loss over several optimizer steps — for BOTH
    the fused slab conv (the default) and the unfused windowed fallback
    (kept for A/B and as the rotinv-adjacent path; without this case the
    FGC_WINDOWED_FUSED=0 branch would have no coverage at all), and at BOTH
    D=1 (local windows) and D=8 (round-5 halo-tail windows: each shard's
    owned band windows, halo columns ride the tail pack through the
    exchange)."""
    import optax  # noqa: F401
    from facet_graph_convolution_tpu.config import default_config
    from facet_graph_convolution_tpu.data.dataset import (
        TrainingSet, bucket_size, pad_patch_to,
    )
    from facet_graph_convolution_tpu.parallel import halo
    from facet_graph_convolution_tpu.parallel.mesh import make_mesh
    from facet_graph_convolution_tpu.training.trainer import create_train_state
    from tests.conftest import make_icosphere

    if devices > len(jax.devices()):
        pytest.skip("needs the 8-virtual-device rig")
    v, f = make_icosphere(3)
    rng = np.random.default_rng(3)
    noisy = (v + rng.normal(scale=0.02, size=v.shape)).astype(np.float32)
    ds = TrainingSet(max_patch_size=20000, coarsening_steps=2,
                     coarsening_levels=3, k_faces=23, seed=0)
    ds.add_mesh(noisy, f, gt_vertices=v)
    patch = pad_patch_to(
        ds.patches[0],
        bucket_size(ds.patches[0].num_nodes, max(16, 16 * devices)))

    cfg = default_config().replace(
        model={"channels": (8, 16, 32), "num_filters": 4, "fc_channels": 32},
    )
    mesh = make_mesh((1, devices), ("data", "graph"))
    part = halo.build_partition(patch.adjs, devices)
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg)

    x = jnp.asarray(patch.inputs)
    gt = jnp.asarray(patch.gt_normals)
    mask = jnp.ones((x.shape[0],), jnp.float32)

    def run(n_steps=6):
        st = state
        step = halo.make_sharded_train_step(tx, cfg, part, mesh)
        losses = []
        with mesh:
            for _ in range(n_steps):
                st, loss = step(st, x, gt, mask)
                losses.append(float(loss))
        return losses

    flat_losses = run()

    # force windowing on (fine level is 1552 nodes -> 13 slabs at D=1; at
    # D=8 each 194-column shard gets 3 overlapping 64-wide slabs; the
    # 97-node coarsest level stays flat)
    monkeypatch.setattr(halo, "_WINDOWED_FUSED", fused)
    monkeypatch.setattr(halo, "WINDOWED_MIN_NODES", 64)
    monkeypatch.setattr(halo, "WINDOWED_BLOCK", 128 if devices == 1 else 64)
    windows = halo.build_level_windows(part)
    assert any(wt is not None for wt in windows), "windowing did not engage"
    if devices > 1:
        assert any(wt is not None and wt.has_tail for wt in windows), (
            "halo-tail windows did not engage at D>1"
        )
    win_losses = run()

    np.testing.assert_allclose(flat_losses, win_losses, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_fused_windowed_conv_matches_unfused(dtype):
    """The fused slab conv (ops.windowed_conv) must match the unfused
    windowed pipeline — gather, softmax assignment, multiplicity weighting,
    f32-accumulated aggregation, MXU transform — in values AND in gradients
    wrt activations and every parameter. The bf16 case runs the production
    compute dtype (the million-facet path is bf16) with the unfused side
    applying the exact casts of parallel.halo._sharded_conv_nminor."""
    from facet_graph_convolution_tpu.ops.windowed_conv import (
        make_windowed_fused_conv,
    )

    dt = jnp.dtype(dtype)
    n, k, band, block = 4096, 7, 96, 512
    in_ch, m, out_ch = 5, 4, 6
    adj = banded_klist(n, k, band, seed=5)
    wt = windowed_lane_tables(adj, block=block, align=64)
    assert wt is not None
    wt_args = tuple(jnp.asarray(a) for a in wt.arrays)
    rng = np.random.default_rng(7)

    cat = jnp.asarray(
        rng.standard_normal((in_ch + m, n)).astype(np.float32)).astype(dt)
    ux = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    wf = jnp.asarray(rng.standard_normal((out_ch, m * in_ch)).astype(np.float32) * 0.1)
    cb = jnp.asarray(rng.standard_normal((m,)).astype(np.float32) * 0.1)
    # fused multiplicity x 1/deg rows: slot 0 = self (positive), 0 on padding
    mult = np.where(adj.T > 0, rng.uniform(0.5, 2.0, size=(k, n)), 0.0)
    mult_rows = jnp.asarray(
        np.concatenate([np.full((1, n), 1.0), mult], axis=0).astype(np.float32))

    gw = make_windowed_lane_gather(wt.geometry)
    fused = make_windowed_fused_conv(wt.geometry)

    def unfused(cat, ux, wf, cb):
        # mirrors the win-branch of _sharded_conv_nminor cast-for-cast
        nbr_g = gw(cat, *wt_args)
        nbr = jnp.concatenate([cat[:, None, :], nbr_g], axis=1)
        logits = (ux[:, None, :].astype(dt) + nbr[in_ch:]
                  + cb[:, None, None].astype(dt))
        q = (jax.nn.softmax(logits.astype(jnp.float32), axis=0)
             * mult_rows[None]).astype(dt)
        z = jnp.sum(q[:, None].astype(jnp.float32)
                    * nbr[:in_ch][None].astype(jnp.float32),
                    axis=2, dtype=jnp.float32)
        z_dt = z.reshape(m * in_ch, n).astype(dt)
        return jnp.einsum("oz,zn->on", wf.astype(dt), z_dt,
                          preferred_element_type=jnp.float32)

    def fused_fn(cat, ux, wf, cb):
        return fused(cat, ux, wf, cb, mult_rows, *wt_args)

    # bf16 rounding is deterministic and both sides share the dataflow, so
    # the bf16 tolerances only need to absorb reassociation across slabs
    tol_v = dict(rtol=2e-5, atol=2e-5) if dt == jnp.float32 else \
        dict(rtol=2e-2, atol=2e-2)
    tol_g = dict(rtol=3e-4, atol=3e-5) if dt == jnp.float32 else \
        dict(rtol=5e-2, atol=5e-2)

    y_ref = unfused(cat, ux, wf, cb)
    y_fus = fused_fn(cat, ux, wf, cb)
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_ref), **tol_v)

    def loss(fn):
        def f(cat, ux, wf, cb):
            y = fn(cat, ux, wf, cb)
            return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape) * 0.01))
        return f

    g_ref = jax.grad(loss(unfused), argnums=(0, 1, 2, 3))(cat, ux, wf, cb)
    g_fus = jax.grad(loss(fused_fn), argnums=(0, 1, 2, 3))(cat, ux, wf, cb)
    for a, b, name in zip(g_ref, g_fus, ("cat", "ux", "wf", "c")):
        np.testing.assert_allclose(np.asarray(b).astype(np.float32),
                                   np.asarray(a).astype(np.float32),
                                   err_msg=name, **tol_g)
