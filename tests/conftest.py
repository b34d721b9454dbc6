"""Test configuration: force an 8-device CPU platform before JAX import so
multi-chip sharding paths are exercised without TPU hardware."""

import os

# The session environment pins JAX_PLATFORMS=axon (remote TPU tunnel, ~0.7s
# per eager op round-trip) — tests must override it, not setdefault it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# keep tests deterministic and fast
os.environ.setdefault("JAX_ENABLE_X64", "0")
# XLA compiles are slow in this environment (~1s per op); a persistent cache
# makes test re-runs cheap.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fgc_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

# sitecustomize (axon TPU tunnel) may have initialized the backend already;
# force CPU with 8 virtual devices regardless (XLA_FLAGS is parsed before
# conftest runs, so the env var alone is not enough).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
try:  # drop any backend initialized before this conftest ran
    import jax.extend.backend

    jax.extend.backend.clear_backends()
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_cube():
    """Unit cube: 8 vertices, 12 triangles — hand-checkable topology."""
    vertices = np.array(
        [
            [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
            [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
        ],
        dtype=np.float32,
    )
    faces = np.array(
        [
            [0, 2, 1], [0, 3, 2],      # bottom (z=0), normal −z
            [4, 5, 6], [4, 6, 7],      # top (z=1), normal +z
            [0, 1, 5], [0, 5, 4],      # y=0 side, normal −y
            [2, 3, 7], [2, 7, 6],      # y=1 side, normal +y
            [1, 2, 6], [1, 6, 5],      # x=1 side, normal +x
            [3, 0, 4], [3, 4, 7],      # x=0 side, normal −x
        ],
        dtype=np.int32,
    )
    return vertices, faces


def make_icosphere(subdiv: int = 2):
    """Icosphere by repeated midpoint subdivision of an icosahedron."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int64,
    )
    for _ in range(subdiv):
        cache = {}
        verts = list(verts)
        new_faces = []

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (np.asarray(verts[a]) + np.asarray(verts[b])) / 2.0
                m = m / np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(m)
            return cache[key]

        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        faces = np.asarray(new_faces, dtype=np.int64)
        verts = np.asarray(verts)
    return verts.astype(np.float32), faces.astype(np.int32)


@pytest.fixture
def cube():
    return make_cube()


@pytest.fixture
def icosphere():
    return make_icosphere(2)
