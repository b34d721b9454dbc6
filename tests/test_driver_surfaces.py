"""Guard the driver-facing entry points: bench.py's measure() and
__graft_entry__'s entry()/dryrun_multichip() must keep working — the round
driver runs them unattended."""

import json
import sys

import jax
import numpy as np
import pytest


def test_bench_measure_runs_small():
    sys.path.insert(0, "/root/repo")
    from bench import count_edges, measure

    result = measure(steps=2, repeats=1, subdiv=2)
    assert result["edges_per_s"] > 0
    assert np.isfinite(result["final_loss"])
    assert result["edges_per_step"] > 0


def test_graft_entry_forward():
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 3
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_graft_dryrun_multichip():
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)   # asserts internally on a finite loss
