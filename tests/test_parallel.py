"""Multi-chip tests on the 8-device virtual CPU mesh: halo-exchange
partitioning must reproduce single-device results exactly; DP step runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facet_graph_convolution_tpu.config import default_config
from facet_graph_convolution_tpu.data.dataset import (
    TrainingSet,
    bucket_size,
    pad_patch_to,
)
from facet_graph_convolution_tpu.models.losses import face_normals_loss
from facet_graph_convolution_tpu.models.unet import init_unet, unet_apply
from facet_graph_convolution_tpu.ops.normalization import normalize_tensor
from facet_graph_convolution_tpu.parallel.data_parallel import (
    make_dp_train_step,
    stack_patches,
)
from facet_graph_convolution_tpu.parallel.halo import (
    build_partition,
    make_sharded_train_step,
    sharded_unet_apply,
)
from facet_graph_convolution_tpu.parallel.mesh import make_mesh
from facet_graph_convolution_tpu.training.trainer import create_train_state
from tests.conftest import make_icosphere

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

D = 8


@pytest.fixture(scope="module")
def sphere_patch():
    v, f = make_icosphere(2)
    rng = np.random.default_rng(3)
    noisy = (v + rng.normal(scale=0.02, size=v.shape)).astype(np.float32)
    ds = TrainingSet(
        max_patch_size=20000, coarsening_steps=2, coarsening_levels=3,
        k_faces=23, seed=0,
    )
    ds.add_mesh(noisy, f, gt_vertices=v)
    patch = ds.patches[0]
    # every pyramid level must divide by D: fine N divisible by 16·D
    target = bucket_size(patch.num_nodes, 16 * D)
    return pad_patch_to(patch, target)


def test_partition_structure(sphere_patch):
    part = build_partition(sphere_patch.adjs, D)
    assert len(part.levels) == 3
    for lvl, adj in zip(part.levels, sphere_patch.adjs):
        assert lvl.num_nodes == adj.shape[0]
        assert lvl.block * D == adj.shape[0]
        # deduped neighbours-only K-list: width shrinks vs the raw K-list
        assert lvl.local_adj.shape[0] == D and lvl.local_adj.shape[1] == lvl.block
        assert lvl.local_adj.shape[2] <= adj.shape[1]
        assert lvl.mult.shape == lvl.local_adj.shape
        assert lvl.self_mult.shape == (D, lvl.block)
        # degree preserved exactly: mult sums equal raw non-zero counts
        deg = lvl.mult.sum(-1) + lvl.self_mult
        raw = np.count_nonzero(adj, axis=-1).reshape(D, lvl.block)
        np.testing.assert_array_equal(deg, raw)
        # every local adjacency entry points inside the extended index space
        # (intra-host ring region + batched all_to_all cross region)
        ext = lvl.block + len(lvl.offsets) * lvl.halo_size + D * lvl.cross_halo
        assert lvl.local_adj.max() <= ext
        assert lvl.local_adj.min() >= 0


def test_sharded_forward_matches_single_device(sphere_patch):
    mesh = make_mesh((1, D), ("data", "graph"))
    part = build_partition(sphere_patch.adjs, D)
    params = init_unet(jax.random.PRNGKey(0), in_channels=6,
                       channels=(8, 16, 32), num_filters=4, fc_channels=32)
    x = jnp.asarray(sphere_patch.inputs)
    adjs = tuple(jnp.asarray(a) for a in sphere_patch.adjs)

    ref = normalize_tensor(jax.jit(unet_apply)(params, x, adjs))
    with mesh:
        out = jax.jit(
            lambda p, xx: sharded_unet_apply(p, xx, part, mesh)
        )(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_sharded_train_step_matches_loss_and_learns(sphere_patch):
    import optax

    cfg = default_config().replace(
        model={"channels": (8, 16, 32), "num_filters": 4, "fc_channels": 32},
    )
    mesh = make_mesh((1, D), ("data", "graph"))
    part = build_partition(sphere_patch.adjs, D)
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_sharded_train_step(tx, cfg, part, mesh)

    x = jnp.asarray(sphere_patch.inputs)
    gt = jnp.asarray(sphere_patch.gt_normals)
    mask = jnp.ones((x.shape[0],), jnp.float32)

    # reference loss on one device with identical params (no sampling)
    y_ref = normalize_tensor(
        jax.jit(unet_apply)(
            state.params, x, tuple(jnp.asarray(a) for a in sphere_patch.adjs)
        )
    )
    ref_loss = float(face_normals_loss(y_ref, gt))

    with mesh:
        state1, loss1 = step(state, x, gt, mask)
        np.testing.assert_allclose(float(loss1), ref_loss, rtol=1e-4)
        losses = [float(loss1)]
        for _ in range(25):
            state1, loss = step(state1, x, gt, mask)
            losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_sharded_nminor_matches_rowmajor(sphere_patch):
    """The node-minor sharded forward (default layout) equals the row-major
    sharded formulation and the single-device node-minor fast path, including
    the multiScale heads."""
    from facet_graph_convolution_tpu.models.unet import unet_apply_nminor
    from facet_graph_convolution_tpu.training.trainer import _graph_arrays

    mesh = make_mesh((1, D), ("data", "graph"))
    part = build_partition(sphere_patch.adjs, D)
    params = init_unet(jax.random.PRNGKey(0), in_channels=6,
                       channels=(8, 16, 32), num_filters=4, fc_channels=32,
                       multi_scale=True)
    x = jnp.asarray(sphere_patch.inputs)

    with mesh:
        out_nm = jax.jit(
            lambda p, xx: sharded_unet_apply(p, xx, part, mesh,
                                             multi_scale=True, layout="nminor")
        )(params, x)
        out_rm = jax.jit(
            lambda p, xx: sharded_unet_apply(p, xx, part, mesh,
                                             multi_scale=True, layout="rowmajor")
        )(params, x)
    for a, b in zip(out_nm, out_rm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    # single-device node-minor oracle (same deduped/self-split semantics)
    adjs, adj_ts, mults = _graph_arrays(sphere_patch.adjs, lane=False)
    rows = tuple(m["rows"] for m in mults)
    y = jax.jit(
        lambda p, xx: unet_apply_nminor(p, xx, adjs, adj_ts, rows,
                                        multi_scale=True)
    )(params, x)
    for a, b in zip(out_nm, y):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(normalize_tensor(b)), atol=5e-5
        )


def test_dp_step_fast_path_matches_single_chip(sphere_patch):
    """The DP step runs the single-chip fast path (dedup/self-split/
    node-minor/lane arrays): with augmentation off and full-coverage loss
    sampling, the DP mean loss equals the single-device trainer's loss for
    the same patch and params, and params update."""
    from facet_graph_convolution_tpu.parallel.data_parallel import (
        build_patch_bank,
        make_dp_scanned_step,
    )
    from facet_graph_convolution_tpu.training.trainer import (
        make_normals_train_step,
        _patch_arrays,
    )

    cfg = default_config().replace(
        model={"channels": (8, 16, 32), "num_filters": 4, "fc_channels": 32},
        train={"loss_samples": 128, "augment_rotations": False},
    )
    mesh = make_mesh((8, 1), ("data", "graph"))
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_dp_train_step(tx, cfg, mesh)

    # a bank of two patches (the same mesh twice keeps shapes trivial)
    bank = jax.tree.map(
        jnp.asarray, build_patch_bank([sphere_patch, sphere_patch], cfg)
    )
    idx = jnp.zeros((8,), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    same_keys = jnp.stack([keys[0]] * 8)

    with mesh:
        # identical patch + identical key on every device ⇒ DP mean loss ==
        # single-device train-step loss with the same key discipline
        state1, loss = step(state, bank, idx, same_keys)
        ref_step = make_normals_train_step(tx, cfg)
        # the bank lane-aligns the node bucket (build_patch_bank); pad the
        # single-device reference patch identically so the random loss-face
        # sample (drawn over x.shape[0]) matches index-for-index
        padded_ref = pad_patch_to(sphere_patch, bank[0].shape[1])
        x, adjs, gt, adj_ts, mults = _patch_arrays(padded_ref)
        _, ref = ref_step(state, x, adjs, gt, keys[0], adj_ts, mults)
        np.testing.assert_allclose(float(loss), float(ref), rtol=1e-4)

        # scanned multi-step dispatch
        run = make_dp_scanned_step(step)
        idxs = jnp.zeros((4, 8), jnp.int32)
        skeys = jax.random.split(jax.random.PRNGKey(2), (4, 8))
        state2, losses = run(state1, bank, idxs, skeys)
        assert np.isfinite(np.asarray(losses)).all()

    w0 = np.asarray(state.params["conv1"]["w"])
    w1 = np.asarray(state1.params["conv1"]["w"])
    assert not np.allclose(w0, w1)


def test_dp_driver_full_contract(tmp_path):
    """train_normals_dp: scanned dispatch, validation sweep, checkpoint and
    CSV artifacts (driver parity with the single-chip train_normals)."""
    from facet_graph_convolution_tpu.parallel.data_parallel import train_normals_dp

    v, f = make_icosphere(2)
    rng = np.random.default_rng(3)
    ds = TrainingSet(max_patch_size=20000, coarsening_steps=2,
                     coarsening_levels=3, k_faces=23, seed=0)
    for s in range(2):
        noisy = (v + rng.normal(scale=0.02, size=v.shape)).astype(np.float32)
        ds.add_mesh(noisy, f, gt_vertices=v)

    cfg = default_config().replace(
        model={"channels": (8, 16, 32), "num_filters": 4, "fc_channels": 32},
        train={"loss_samples": 128, "network_path": str(tmp_path),
               "net_name": "dpnet", "valid_every": 4, "save_every": 8},
    )
    mesh = make_mesh((8, 1), ("data", "graph"))
    state, losses = train_normals_dp(
        cfg, ds, mesh, valid_set=ds, num_iterations=8, steps_per_call=4,
        checkpoint=True,
    )
    assert np.isfinite(losses).all() and losses.shape[0] == 8
    assert (tmp_path / "dpnet.csv").exists()
    # resumable: a fresh driver restores from the saved checkpoint
    state2, _ = train_normals_dp(
        cfg, ds, mesh, num_iterations=2, checkpoint=True,
    )
    assert int(state2.step) >= 2


def test_sharded_whole_mesh_inference_matches_patched():
    """Sharded single-pass inference equals unsharded single-patch inference."""
    from facet_graph_convolution_tpu.data.dataset import InferenceMesh
    from facet_graph_convolution_tpu.inference.driver import infer_normals
    from facet_graph_convolution_tpu.inference.sharded import infer_normals_sharded

    v, f = make_icosphere(2)
    rng = np.random.default_rng(3)
    noisy = (v + rng.normal(scale=0.02, size=v.shape)).astype(np.float32)
    mesh_data = InferenceMesh(
        max_patch_size=10**9, coarsening_steps=2, coarsening_levels=3,
        k_faces=23, seed=0,
    )
    mesh_data.add_mesh(noisy, f)

    cfg = default_config().replace(
        model={"channels": (8, 16, 32), "num_filters": 4, "fc_channels": 32},
        eval={"solver_iterations": 10},
    )
    params = init_unet(jax.random.PRNGKey(0), in_channels=6,
                       channels=(8, 16, 32), num_filters=4, fc_channels=32)

    pts_ref, n_ref = infer_normals(mesh_data, cfg, params=params,
                                   solver_iterations=10)
    dev_mesh = make_mesh((1, D), ("data", "graph"))
    pts_sh, n_sh = infer_normals_sharded(mesh_data, cfg, params,
                                         device_mesh=dev_mesh,
                                         solver_iterations=10)
    np.testing.assert_allclose(n_sh, n_ref, atol=1e-4)
    np.testing.assert_allclose(pts_sh, pts_ref, atol=1e-4)


def test_train_normals_dp_driver():
    from facet_graph_convolution_tpu.data.dataset import TrainingSet
    from facet_graph_convolution_tpu.parallel.data_parallel import train_normals_dp

    v, f = make_icosphere(2)
    rng = np.random.default_rng(3)
    ds = TrainingSet(
        max_patch_size=20000, coarsening_steps=2, coarsening_levels=3,
        k_faces=23, seed=0,
    )
    for _ in range(2):
        noisy = (v + rng.normal(scale=0.02, size=v.shape)).astype(np.float32)
        ds.add_mesh(noisy, f, gt_vertices=v)

    cfg = default_config().replace(
        model={"channels": (8, 16, 32), "num_filters": 4, "fc_channels": 32},
        train={"loss_samples": 128},
    )
    mesh = make_mesh((8, 1), ("data", "graph"))
    state, losses = train_normals_dp(cfg, ds, mesh, num_iterations=40,
                                     log_every=20)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_sharded_grads_match_single_device(sphere_patch):
    """Gradients through the sharded step (halo exchange + scatter-free
    backward) must equal the single-device gradients."""
    import optax

    from facet_graph_convolution_tpu.models.losses import face_normals_loss
    from facet_graph_convolution_tpu.ops.normalization import normalize_tensor

    cfg = default_config().replace(
        model={"channels": (8, 16, 32), "num_filters": 4, "fc_channels": 32},
    )
    mesh = make_mesh((1, D), ("data", "graph"))
    part = build_partition(sphere_patch.adjs, D)
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(sphere_patch.inputs)
    gt = jnp.asarray(sphere_patch.gt_normals)
    adjs = tuple(jnp.asarray(a) for a in sphere_patch.adjs)

    def single_loss(params):
        y = normalize_tensor(unet_apply(params, x, adjs))
        return face_normals_loss(y, gt)

    g_single = jax.jit(jax.grad(single_loss))(state.params)

    from facet_graph_convolution_tpu.parallel.halo import (
        _sharded_face_normals_loss,
        _sharded_normalize_tensor,
        partition_operands,
        sharded_unet_forward_local,
    )
    from functools import partial as fpartial
    from jax.sharding import PartitionSpec as P

    operands = partition_operands(part)
    offsets = tuple(lvl.offsets for lvl in part.levels)
    in_specs = (P(), P("graph"), P("graph"),
                jax.tree.map(lambda _: P("graph"), operands))

    @fpartial(jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=P())
    def sharded_grads(params, x_b, gt_b, level_ops):
        level_ops = jax.tree.map(lambda arr: arr[0], level_ops)

        def loss_fn(params):
            y = sharded_unet_forward_local(
                params, x_b, level_ops, offsets, "graph", coarsening_steps=2
            )
            y = _sharded_normalize_tensor(y, "graph")
            mask = jnp.ones((x_b.shape[0],), jnp.float32)
            return _sharded_face_normals_loss(y, gt_b, mask, "graph")

        return jax.lax.pmean(jax.grad(loss_fn)(params), "graph")

    with mesh:
        g_sharded = jax.jit(sharded_grads)(state.params, x, gt, operands)

    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_partition_handles_non_banded_graphs(rng):
    """Random (non-banded) adjacency: cross-shard edges span arbitrary shard
    offsets; the halo exchange must still reproduce single-device results."""
    n, k = 16 * D, 7
    adjs = []
    sz = n
    for _ in range(3):
        adj = np.zeros((sz, k), np.int32)
        adj[:, 0] = np.arange(sz) + 1
        for i in range(sz):
            deg = int(rng.integers(1, k - 1))
            # global random neighbours → many far shard offsets
            adj[i, 1 : 1 + deg] = rng.choice(sz, size=deg, replace=False) + 1
        adjs.append(adj)
        sz //= 4
    # pin the ring form: this test exercises far ppermute offsets (auto
    # would batch this all-pairs pattern into the a2a form)
    part = build_partition(adjs, D, exchange="rings")
    # far offsets present (not just ±1)
    assert max(abs(d) for d in part.levels[0].offsets) > 1
    auto = build_partition(adjs, D)
    assert auto.levels[0].cross_send is not None   # auto picked the a2a form

    params = init_unet(jax.random.PRNGKey(0), in_channels=6,
                       channels=(8, 16, 32), num_filters=4, fc_channels=32)
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    ref = normalize_tensor(
        jax.jit(unet_apply)(params, x, tuple(jnp.asarray(a) for a in adjs))
    )
    mesh = make_mesh((1, D), ("data", "graph"))
    with mesh:
        out = jax.jit(
            lambda p, xx: sharded_unet_apply(p, xx, part, mesh)
        )(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_tensor_parallel_fc_sharding(rng):
    """Megatron-style fc sharding: the forward under sharded params matches
    the replicated forward."""
    from facet_graph_convolution_tpu.parallel.tensor_parallel import (
        shard_unet_params,
    )
    from tests.test_models import make_pyramid_graph

    adjs = make_pyramid_graph(rng)
    x = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32))
    params = init_unet(jax.random.PRNGKey(0), in_channels=6,
                       channels=(8, 16, 32), num_filters=4, fc_channels=64)
    ref = np.asarray(jax.jit(unet_apply)(params, x, adjs))

    mesh = make_mesh((1, D), ("data", "graph"))
    with mesh:
        sharded = shard_unet_params(params, mesh, axis="graph")
        out = np.asarray(jax.jit(unet_apply)(sharded, x, adjs))
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # fc1 weight really is sharded over the hidden axis
    sh = sharded["fc1"]["w"].sharding
    assert sh.spec == jax.sharding.PartitionSpec(None, "graph")


def test_sharded_vertex_solver_matches_single_device():
    """Sharded edge-map Taubin solver equals the single-device solver."""
    from facet_graph_convolution_tpu.geometry import compute_face_normals, edge_map
    from facet_graph_convolution_tpu.ops.vertex_update import update_positions_edges
    from facet_graph_convolution_tpu.parallel.vertex_halo import (
        sharded_update_positions_edges,
    )

    v, f = make_icosphere(2)
    rng = np.random.default_rng(3)
    noisy = (v + rng.normal(scale=0.05, size=v.shape)).astype(np.float32)
    normals = compute_face_normals(v, f)
    e_map, v_e_map = edge_map(f, max_edges=20)

    ref = np.asarray(
        update_positions_edges(
            jnp.asarray(noisy), jnp.asarray(normals), jnp.asarray(e_map),
            jnp.asarray(v_e_map), iter_num=30, checkpoint=False,
        )
    )
    mesh = make_mesh((1, D), ("data", "graph"))
    out = sharded_update_positions_edges(
        noisy, normals, e_map, v_e_map, mesh, iter_num=30
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_sharded_multiscale_solver_matches_single_device():
    """Sharded multi-scale projection solver equals the single-device solver
    (two halo exchanges per iteration: vertices→faces, faces→vertices)."""
    from facet_graph_convolution_tpu.data.dataset import TrainingSet
    from facet_graph_convolution_tpu.ops.pooling import tree_pool
    from facet_graph_convolution_tpu.ops.vertex_update import (
        update_positions_multiscale,
    )
    from facet_graph_convolution_tpu.parallel.vertex_halo import (
        sharded_update_positions_multiscale,
    )
    from facet_graph_convolution_tpu.geometry.mesh_math import normalize_rows

    v, f = make_icosphere(2)
    rng = np.random.default_rng(3)
    noisy = (v + rng.normal(scale=0.03, size=v.shape)).astype(np.float32)
    ds = TrainingSet(
        max_patch_size=10**9, coarsening_steps=2, coarsening_levels=3,
        k_faces=23, seed=0,
    )
    ds.add_mesh_with_vertices(noisy, f, gt_vertices=v)
    patch = ds.patches[0]

    # synthetic per-level normals (as the multiScale heads would produce)
    n0 = patch.gt_normals
    n1 = np.asarray(tree_pool(jnp.asarray(n0), 2, "avg_ignore_zeros"))
    n2 = np.asarray(tree_pool(jnp.asarray(n1), 2, "avg_ignore_zeros"))
    fn_list = [n0, n1, n2]
    iters = (10, 5, 5)

    ref, ref_dx = update_positions_multiscale(
        jnp.asarray(patch.vertices),
        [jnp.asarray(n) for n in fn_list],
        jnp.asarray(patch.faces),
        jnp.asarray(patch.v_faces),
        coarsening_steps=2, iter_nums=iters, checkpoint=False,
    )
    mesh = make_mesh((1, D), ("data", "graph"))
    out, dx = sharded_update_positions_multiscale(
        patch.vertices, fn_list, patch.faces, patch.v_faces, mesh,
        coarsening_steps=2, iter_nums=iters,
    )
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-4)
    for a, b in zip(dx, ref_dx):
        np.testing.assert_allclose(a, np.asarray(b)[: a.shape[0]], atol=1e-4)


def test_sharded_with_vertices_inference_matches():
    """Fully sharded multi-scale inference equals the single-device path."""
    from facet_graph_convolution_tpu.data.dataset import InferenceMesh
    from facet_graph_convolution_tpu.inference.driver import infer_with_vertices
    from facet_graph_convolution_tpu.inference.sharded import (
        infer_with_vertices_sharded,
    )

    v, f = make_icosphere(2)
    rng = np.random.default_rng(3)
    noisy = (v + rng.normal(scale=0.02, size=v.shape)).astype(np.float32)
    mesh_data = InferenceMesh(
        max_patch_size=10**9, coarsening_steps=2, coarsening_levels=3,
        k_faces=23, seed=0,
    )
    mesh_data.add_mesh_with_vertices(noisy, f)

    cfg = default_config().replace(
        model={"channels": (8, 16, 32), "num_filters": 4, "fc_channels": 32},
        eval={"ms_solver_iterations": (8, 4, 4)},
    )
    params = init_unet(jax.random.PRNGKey(0), in_channels=6,
                       channels=(8, 16, 32), num_filters=4, fc_channels=32,
                       multi_scale=True)

    ref = infer_with_vertices(mesh_data, cfg, params=params)
    dev_mesh = make_mesh((1, D), ("data", "graph"))
    out = infer_with_vertices_sharded(mesh_data, cfg, params,
                                      device_mesh=dev_mesh)
    for key in ("points", "points_mid", "points_coarse",
                "fine_normals", "mid_normals", "coarse_normals"):
        np.testing.assert_allclose(out[key], ref[key], atol=2e-4, err_msg=key)


@pytest.mark.parametrize("solver", ["operator", "naive"])
def test_sharded_vertex_training_matches_and_learns(solver):
    """Sharded end-to-end vertex training: first-step chamfer loss matches
    the single-device trainer (same samples, no augmentation), and the loss
    decreases over iterations — for BOTH sharded solver bodies (the round-5
    operator port and the per-slot naive body), each against the
    single-device naive oracle."""
    import optax

    from facet_graph_convolution_tpu.data.dataset import TrainingSet
    from facet_graph_convolution_tpu.models.losses import full_chamfer_loss
    from facet_graph_convolution_tpu.models.unet import unet_apply
    from facet_graph_convolution_tpu.ops.normalization import normalize_tensor
    from facet_graph_convolution_tpu.ops.vertex_update import (
        update_positions_multiscale,
    )
    from facet_graph_convolution_tpu.parallel.vertex_train import (
        make_sharded_vertex_train_step,
        prepare_vertex_training,
    )

    v, f = make_icosphere(2)
    rng = np.random.default_rng(3)
    noisy = (v + rng.normal(scale=0.02, size=v.shape)).astype(np.float32)
    ds = TrainingSet(
        max_patch_size=10**9, coarsening_steps=2, coarsening_levels=3,
        k_faces=23, seed=0,
    )
    ds.add_mesh_with_vertices(noisy, f, gt_vertices=v)
    patch = ds.patches[0]

    cfg = default_config().replace(
        model={"channels": (8, 16, 32), "num_filters": 4, "fc_channels": 32},
        eval={"ms_solver_iterations": (8, 4, 4), "vertex_solver": solver},
        train={"learning_rate": 1e-3},
    )
    mesh = make_mesh((1, D), ("data", "graph"))
    arrays, conv_part, solver_ops = prepare_vertex_training(patch, cfg, D)
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg, multi_scale=True)
    step = make_sharded_vertex_train_step(
        tx, cfg, conv_part, solver_ops, mesh, augment=False
    )

    idx0 = jnp.asarray(rng.integers(0, arrays["num_vertices"], size=64))
    idx1 = jnp.asarray(rng.integers(0, arrays["num_gt"], size=64))

    # single-device reference loss with identical params/samples
    x = jnp.asarray(patch.inputs)
    adjs = tuple(jnp.asarray(a) for a in patch.adjs)
    y0, y1, y2 = unet_apply(state.params, x, adjs, multi_scale=True)
    n_heads = [normalize_tensor(y) for y in (y0, y1, y2)]
    refined, _ = update_positions_multiscale(
        jnp.asarray(patch.vertices), n_heads, jnp.asarray(patch.faces),
        jnp.asarray(patch.v_faces), coarsening_steps=2, iter_nums=(8, 4, 4),
        checkpoint=False,
    )
    ref_loss = float(
        full_chamfer_loss(refined, jnp.asarray(patch.gt_vertices), idx0, idx1)
    )

    with mesh:
        key = jax.random.PRNGKey(1)
        state1, loss1 = step(state, arrays, idx0, idx1, key)
        np.testing.assert_allclose(float(loss1), ref_loss, rtol=2e-3)
        losses = [float(loss1)]
        for i in range(15):
            key, sub = jax.random.split(key)
            state1, loss = step(state1, arrays, idx0, idx1, sub)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sharded_vertex_driver_contract(tmp_path):
    """train_with_vertices_sharded: full driver contract (augment, Orbax
    checkpoint/resume, validation sweep, CSV) over the 8-shard mesh."""
    from facet_graph_convolution_tpu.data.dataset import TrainingSet
    from facet_graph_convolution_tpu.parallel.vertex_train import (
        train_with_vertices_sharded,
    )

    v, f = make_icosphere(2)
    rng = np.random.default_rng(3)
    ds = TrainingSet(
        max_patch_size=10**9, coarsening_steps=2, coarsening_levels=3,
        k_faces=23, seed=0,
    )
    for noise in (0.02, 0.01):
        noisy = (v + rng.normal(scale=noise, size=v.shape)).astype(np.float32)
        ds.add_mesh_with_vertices(noisy, f, gt_vertices=v)

    cfg = default_config().replace(
        model={"channels": (8, 16, 32), "num_filters": 4, "fc_channels": 32},
        eval={"ms_solver_iterations": (4, 2, 2)},
        train={"chamfer_samples": 64, "network_path": str(tmp_path),
               "net_name": "vshard", "valid_every": 4, "save_every": 600},
    )
    mesh = make_mesh((1, D), ("data", "graph"))
    state, losses = train_with_vertices_sharded(
        cfg, ds.patches[0], mesh, num_iterations=6,
        valid_patches=[ds.patches[1]], log_every=3, checkpoint=True,
    )
    assert np.isfinite(losses).all() and losses.shape[0] == 6
    assert (tmp_path / "vshard.csv").exists()
    # resume restores the saved step counter
    state2, _ = train_with_vertices_sharded(
        cfg, ds.patches[0], mesh, num_iterations=2, checkpoint=True,
    )
    assert int(state2.step) >= 6


def test_partition_million_nodes_bounded_time():
    """Host partitioner at the million-facet regime (BASELINE.md scaling row;
    SURVEY §7.2 step 6): a 1,048,576-node fine level plus two coarser levels
    partitions for 8 shards in bounded wall time. The per-remote-edge dict
    remap this vectorized slot-map replaced (parallel/halo.py) extrapolated
    to minutes-to-hours at this size."""
    import time

    rng = np.random.default_rng(0)
    n, k = 1 << 20, 8
    adjs = []
    sz = n
    for _ in range(3):
        idx = np.arange(sz, dtype=np.int64)
        adj = np.zeros((sz, k), np.int32)
        adj[:, 0] = idx + 1                          # self slot
        adj[:, 1] = ((idx + 1) % sz) + 1             # banded ring neighbours
        adj[:, 2] = ((idx - 1) % sz) + 1
        adj[:, 3] = ((idx + 17) % sz) + 1
        # non-banded remote edges so the halo remap does real work
        adj[:, 4] = rng.integers(0, sz, size=sz) + 1
        adjs.append(adj)
        sz //= 4

    t0 = time.time()
    part = build_partition(adjs, 8)
    elapsed = time.time() - t0
    assert part.fine.num_nodes == n
    assert part.fine.block == n // 8
    # generous bound for loaded hosts; the regression this guards is
    # per-edge Python (minutes at 1M nodes), not constant factors
    assert elapsed < 180.0, f"1M-node partition took {elapsed:.1f}s"


def test_vertex_partition_million_rows_bounded_time():
    """partition_index_map (vertex/face halo tables) stays vectorized at the
    million-row regime — same dense slot-map remap as the conv partitioner."""
    import time

    from facet_graph_convolution_tpu.parallel.vertex_halo import (
        partition_index_map,
    )

    rng = np.random.default_rng(0)
    n, k = 1 << 20, 9
    idx = np.arange(n, dtype=np.int64)[:, None] + np.arange(k)[None, :]
    idx = idx % n
    idx[:, -1] = rng.integers(0, n, size=n)          # non-banded remotes
    idx[rng.integers(0, n, size=n // 50), 0] = -1    # pad rows

    t0 = time.time()
    part = partition_index_map(idx, 8)
    elapsed = time.time() - t0
    assert part.local_idx.shape[0] == 8
    assert elapsed < 120.0, f"1M-row index partition took {elapsed:.1f}s"
