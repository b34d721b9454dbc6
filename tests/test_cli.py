"""Integration test: the four CLIs chained end-to-end on a synthetic dataset
laid out exactly like the reference expects (noisy "<name>_n1.obj" with GT
"<name>.obj", settings.py:44-47)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from facet_graph_convolution_tpu.config import default_config
from facet_graph_convolution_tpu.data.dataset import load_dataset
from facet_graph_convolution_tpu.data.preprocess import preprocess_directory
from facet_graph_convolution_tpu.evaluation.driver import compute_metrics
from facet_graph_convolution_tpu.geometry import load_obj, write_obj
from facet_graph_convolution_tpu.inference.driver import infer_directory
from facet_graph_convolution_tpu.training.trainer import train_normals
from tests.conftest import make_icosphere


@pytest.fixture(scope="module")
def data_tree(tmp_path_factory):
    base = tmp_path_factory.mktemp("run")
    cfg = default_config(str(base) + "/")
    for d in (
        cfg.data.training_data_path,
        cfg.data.gt_data_path,
        cfg.data.test_data_path,
        cfg.data.test_gt_data_path,
    ):
        os.makedirs(d, exist_ok=True)

    rng = np.random.default_rng(0)
    v, f = make_icosphere(2)
    # training pair
    write_obj(v, f, os.path.join(cfg.data.gt_data_path, "sphere.obj"))
    noisy = (v + rng.normal(scale=0.02, size=v.shape)).astype(np.float32)
    write_obj(noisy, f, os.path.join(cfg.data.training_data_path, "sphere_n1.obj"))
    # test pair
    write_obj(v, f, os.path.join(cfg.data.test_gt_data_path, "sphere.obj"))
    noisy2 = (v + rng.normal(scale=0.02, size=v.shape)).astype(np.float32)
    write_obj(noisy2, f, os.path.join(cfg.data.test_data_path, "sphere_n1.obj"))

    cfg = cfg.replace(
        model={"channels": (8, 16, 32), "num_filters": 4, "fc_channels": 32},
        train={
            "loss_samples": 256,
            "network_path": os.path.join(str(base), "Networks/") ,
            "net_name": "net",
            "save_every": 10000,
            "eval_every": 100,
        },
        eval={"results_path": os.path.join(str(base), "Results/")},
    )
    return cfg


def test_preprocess_train_infer_metrics(data_tree):
    cfg = data_tree

    # 1. preprocess
    preprocess_directory(cfg, with_vertices=False)
    train_npz = os.path.join(cfg.data.binary_dump_path, "trainingSet.npz")
    assert os.path.isfile(train_npz)
    ds = load_dataset(train_npz)
    assert len(ds.patches) == 1

    # 2. train (short)
    state, hist = train_normals(cfg, ds, num_iterations=300, bucket_align=64,
                                log_every=100)
    assert np.isfinite(hist[:, 0]).all()

    # 3. infer over the test directory
    infer_directory(cfg.data.test_data_path, cfg, with_vertices=False)
    result = os.path.join(cfg.eval.results_path, "sphere_n1_denoised.obj")
    assert os.path.isfile(result)
    assert os.path.isfile(
        os.path.join(cfg.eval.results_path, "sphere_n1_inferred_normals.obj")
    )

    # denoised mesh loads and has the right topology
    v, f, _ = load_obj(result)
    _, f_ref = (None, None)
    assert f.shape[1] == 3

    # 4. metrics: heatmap + CSV row
    compute_metrics(cfg)
    csv_path = os.path.join(cfg.eval.results_path, "results_heat.csv")
    assert os.path.isfile(csv_path)
    rows = open(csv_path).read().strip().splitlines()
    assert any("sphere_n1_denoised.obj" in r for r in rows)
    assert os.path.isfile(
        os.path.join(cfg.eval.results_path, "sphere_n1_heatmap.obj")
    )

    # re-running inference skips existing results (B_OVERWRITE semantics)
    mtime = os.path.getmtime(result)
    infer_directory(cfg.data.test_data_path, cfg, with_vertices=False)
    assert os.path.getmtime(result) == mtime

    # 5. serving: batched multi-mesh InferenceServer against the same
    # checkpoint matches the per-patch driver's output topology
    from facet_graph_convolution_tpu.inference.serving import InferenceServer

    server = InferenceServer(cfg, bucket_align=64)
    v_n, f_n, _ = load_obj(
        os.path.join(cfg.data.test_data_path, "sphere_n1.obj")
    )
    (refined, normals), = server.denoise_batch([(v_n, f_n)])
    assert refined.shape == v_n.shape
    assert normals.shape == (f_n.shape[0], 3)
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-4)

    # 6. AOT export from the trained checkpoint roundtrips
    from facet_graph_convolution_tpu.data.dataset import bucket_size, pad_patch_to
    from facet_graph_convolution_tpu.inference.serving import (
        export_forward,
        load_forward,
    )

    patch = pad_patch_to(ds.patches[0], bucket_size(ds.patches[0].num_nodes, 64))
    widths = [a.shape[1] for a in patch.adjs]
    data = export_forward(cfg, state.params, patch.num_nodes, widths)
    fn = load_forward(data)
    import jax.numpy as jnp

    # default export takes params as the first call argument
    y = np.asarray(fn(state.params, jnp.asarray(patch.inputs)[None],
                      *[jnp.asarray(a)[None] for a in patch.adjs]))[0]
    assert y.shape == (patch.num_nodes, 3)
    assert np.isfinite(y).all()


def test_cli_entrypoints_run_as_modules(data_tree):
    """The `python -m ...cli.*` entry points parse args and run (subprocess
    smoke on the already-populated tree)."""
    cfg = data_tree
    base = cfg.data.base_path
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "facet_graph_convolution_tpu.cli.metrics",
         "--base_path", base, "--results_path", cfg.eval.results_path],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]


def test_vertex_pipeline_cli_chain(tmp_path_factory):
    """preprocess --with-vertices → train_with_vertices → infer_with_vertices
    through the same surfaces the CLIs use."""
    import numpy as np

    from facet_graph_convolution_tpu.data.dataset import load_dataset
    from facet_graph_convolution_tpu.geometry import write_obj
    from facet_graph_convolution_tpu.training.trainer import train_with_vertices
    from tests.conftest import make_icosphere

    base = tmp_path_factory.mktemp("vrun")
    cfg = default_config(str(base) + "/").replace(
        model={"channels": (4, 8, 16), "num_filters": 2, "fc_channels": 16,
               "include_vertices": True},
        train={
            "chamfer_samples": 32,
            "network_path": os.path.join(str(base), "Networks/"),
            "save_every": 10000,
            "valid_every": 10000,
        },
        eval={
            "results_path": os.path.join(str(base), "Results/"),
            "ms_solver_iterations": (4, 2, 2),
        },
    )
    for d in (cfg.data.training_data_path, cfg.data.gt_data_path,
              cfg.data.test_data_path):
        os.makedirs(d, exist_ok=True)
    v, f = make_icosphere(1)
    rng = np.random.default_rng(0)
    write_obj(v, f, os.path.join(cfg.data.gt_data_path, "s.obj"))
    noisy = (v + rng.normal(scale=0.02, size=v.shape)).astype(np.float32)
    write_obj(noisy, f, os.path.join(cfg.data.training_data_path, "s_n1.obj"))
    write_obj(noisy, f, os.path.join(cfg.data.test_data_path, "s_n1.obj"))

    preprocess_directory(cfg, with_vertices=True)
    path = os.path.join(cfg.data.binary_dump_path, "trainingSetWithVertices.npz")
    assert os.path.isfile(path)
    ds = load_dataset(path)
    assert ds.patches[0].vertices is not None

    state, losses = train_with_vertices(cfg, ds, num_iterations=5)
    # hist rows are (train, last_valid); valid is NaN with no valid_set
    assert np.isfinite(losses[:, 0]).all()

    infer_directory(cfg.data.test_data_path, cfg, with_vertices=True,
                    params=state.params)
    assert os.path.isfile(os.path.join(cfg.eval.results_path, "s_n1_denoised.obj"))
    assert os.path.isfile(os.path.join(cfg.eval.results_path, "s_n1_d_mid.obj"))
    assert os.path.isfile(
        os.path.join(cfg.eval.results_path, "s_n1_fine_normals_s.obj")
    )
