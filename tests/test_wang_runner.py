"""Wang-dataset parity runner (cli/wang.py): the full one-command chain
(stage → preprocess → train → infer → metrics → summary) on a tiny
synthetic dataset laid out in the Wang et al. convention
(reference README.md:61-72, settings.py:44-47)."""

import os

import numpy as np
import pytest

from facet_graph_convolution_tpu.data.synthetic import (
    add_vertex_noise,
    icosphere,
)
from facet_graph_convolution_tpu.geometry.obj_io import write_obj


def _make_wang_tree(root):
    """train/{noisy,original} + test/{noisy,original} with _n1/_n2 names."""
    rng = np.random.default_rng(0)
    v, f = icosphere(3)
    for split in ("train", "test"):
        noisy_dir = root / split / "noisy"
        gt_dir = root / split / "original"
        noisy_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        write_obj(v, f, str(gt_dir / "sphere.obj"))
        for i, level in enumerate(("_n1", "_n2"), start=1):
            noisy = add_vertex_noise(v, f, 0.1 * i, rng)
            write_obj(noisy, f, str(noisy_dir / f"sphere{level}.obj"))


@pytest.mark.slow
def test_wang_runner_end_to_end(tmp_path):
    from facet_graph_convolution_tpu.cli.wang import main

    data_root = tmp_path / "wang_data"
    _make_wang_tree(data_root)
    base = tmp_path / "run"

    rc = main([
        "--data_root", str(data_root),
        "--base_path", str(base),
        "--num_iterations", "30",
    ])
    assert rc == 0

    # every pipeline artifact exists
    assert (base / "Preprocessed_Data" / "trainingSet.npz").exists()
    assert (base / "Networks" / "wang.csv").exists()
    results = base / "Results"
    denoised = sorted(p.name for p in results.glob("*_denoised.obj"))
    assert denoised == ["sphere_n1_denoised.obj", "sphere_n2_denoised.obj"]
    assert (results / "results_heat.csv").exists()
    csv_lines = (results / "results_heat.csv").read_text().strip().splitlines()
    assert len(csv_lines) == 2
    # angular-error columns parse and are sane (untrained-ish net: < 90°)
    for line in csv_lines:
        ang_mean = float(line.split()[3])
        assert 0.0 < ang_mean < 90.0

    # resumability: a second call skips preprocessing and reuses the
    # checkpoint without retraining
    rc = main([
        "--data_root", str(data_root),
        "--base_path", str(base),
        "--skip_train",
    ])
    assert rc == 0
