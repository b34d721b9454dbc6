"""Multi-host runtime: 2-process jax.distributed execution and the
DCN-aware (host-split) halo partition.

The reference has no distributed execution at all (SURVEY.md §2.7); these
tests cover the framework's own multi-host subsystem without a pod:

- a REAL 2-process ``jax.distributed`` run (gloo CPU collectives) through
  the pod launch one-liner (`python -m ...parallel.launch`), checked for
  loss parity against the single-process run of the same seed;
- the host-aware partition (intra-host ppermute rings + one batched
  cross-host all_to_all per layer) checked for forward parity against the
  plain ring partition in-process on the 8-device virtual mesh.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_env():
    env = dict(os.environ)
    # the parent test env pins an 8-device CPU platform; workers configure
    # their own device count via --cpu_devices
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fgc_jax_cache")
    return env


def _run_launch(extra, timeout=520):
    cmd = [sys.executable, "-m", "facet_graph_convolution_tpu.parallel.launch"] + extra
    return subprocess.run(
        cmd, cwd=REPO, env=_launch_env(), timeout=timeout,
        capture_output=True, text=True,
    )


def _final_metric(stdout: str) -> dict:
    for line in reversed(stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON metric line in output:\n{stdout}")


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    """The pod one-liner runs under real multi-process jax.distributed and
    reproduces the single-process loss trajectory exactly (the 2-process run
    exercises the cross-host all_to_all batching; the 1-process run the pure
    ppermute rings)."""
    train_args = ["train", "--iterations", "12", "--subdiv", "3"]

    single = _run_launch(["--cpu_devices", "4"] + train_args)
    assert single.returncode == 0, single.stderr[-2000:]
    ref = _final_metric(single.stdout)

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "facet_graph_convolution_tpu.parallel.launch",
             "--coordinator", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(pid),
             "--cpu_devices", "2"] + train_args,
            cwd=REPO, env=_launch_env(),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=520)
        assert p.returncode == 0, err[-2000:]
        outs.append(_final_metric(out))

    for got in outs:
        assert got["first_loss"] == pytest.approx(ref["first_loss"], abs=1e-3)
        assert got["value"] == pytest.approx(ref["value"], rel=1e-3)
    # training made progress
    assert outs[0]["value"] < outs[0]["first_loss"]


def test_host_aware_partition_forward_parity(icosphere):
    """build_partition(devices_per_host=4) (2 'hosts' × 4 shards: boundary
    rows ride the batched all_to_all) matches the plain ring partition and
    the unsharded forward on the virtual 8-device mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp

    from facet_graph_convolution_tpu.config import default_config
    from facet_graph_convolution_tpu.data.dataset import TrainingSet, bucket_size, pad_patch_to
    from facet_graph_convolution_tpu.models.unet import init_unet, unet_apply
    from facet_graph_convolution_tpu.ops.normalization import normalize_tensor
    from facet_graph_convolution_tpu.parallel.halo import (
        build_partition,
        sharded_unet_apply,
    )
    from facet_graph_convolution_tpu.parallel.mesh import make_mesh

    v, f = icosphere
    ds = TrainingSet(max_patch_size=10**9, coarsening_steps=2,
                     coarsening_levels=3, k_faces=23, seed=0)
    ds.add_mesh(v, f, gt_vertices=v)
    patch = pad_patch_to(ds.patches[0], bucket_size(ds.patches[0].num_nodes, 16 * 8))

    D = 8
    mesh = make_mesh((1, D), ("data", "graph"))
    params = init_unet(jax.random.PRNGKey(0), in_channels=6,
                       channels=(8, 16, 32), num_filters=4, fc_channels=32)
    x = jnp.asarray(patch.inputs)

    plain = build_partition(patch.adjs, D)
    hostaware = build_partition(patch.adjs, D, devices_per_host=4)

    # the host-aware partition actually uses the cross tables
    fine = hostaware.levels[0]
    assert fine.cross_send is not None
    assert float(fine.cross_mask.sum()) > 0
    # intra offsets never leave a host slab
    for s_off in fine.offsets:
        assert abs(s_off) < 8

    y_ref = normalize_tensor(unet_apply(params, x, tuple(jnp.asarray(a) for a in patch.adjs)))
    with mesh:
        y_plain = sharded_unet_apply(params, x, plain, mesh)
        y_host = sharded_unet_apply(params, x, hostaware, mesh)
    np.testing.assert_allclose(np.asarray(y_host), np.asarray(y_plain),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(y_host), np.asarray(y_ref),
                               atol=5e-4, rtol=5e-4)
