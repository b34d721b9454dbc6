"""In-graph rotation augmentation.

The reference applies a fresh uniform-random global rotation to the input
normals+positions and the GT normals every training iteration
(train.py:436-483), host-generating the matrix (utils.py:2034). Here the
matrix comes from ``jax.random`` inside the jitted step so augmentation costs
no host→device traffic.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def random_rotation(key: jax.Array, deflection: float = 1.0) -> jnp.ndarray:
    """Uniform random rotation matrix (Arvo's method — same construction as
    the host-side generator, utils.py:2034-2074) as a traced jnp value."""
    theta, phi, z = jax.random.uniform(key, (3,))
    theta = theta * 2.0 * deflection * jnp.pi
    phi = phi * 2.0 * jnp.pi
    z = z * 2.0 * deflection
    r = jnp.sqrt(z)
    v = jnp.stack([jnp.sin(phi) * r, jnp.cos(phi) * r, jnp.sqrt(2.0 - z)])
    st, ct = jnp.sin(theta), jnp.cos(theta)
    rot_z = jnp.array([[ct, st, 0.0], [-st, ct, 0.0], [0.0, 0.0, 1.0]])
    return (jnp.outer(v, v) - jnp.eye(3)) @ rot_z


def rotate_vec3(rot: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Rotate [N, 3] vectors by one [3, 3] matrix."""
    return x @ rot.T


def rotate_inputs(rot: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Rotate a channel-stacked signal [N, C].

    Channel layouts follow the reference (train.py:444-479):
    - C % 3 == 0: C/3 consecutive 3-vectors (e.g. normal + position);
    - C == 7: normal(3) + border flag(1) + position(3);
    - C == 8: normal(3) + area/border(2) + position(3).
    """
    n, c = x.shape
    if c % 3 == 0:
        blocks = x.reshape(n, c // 3, 3)
        return (blocks @ rot.T).reshape(n, c)
    if c == 7:
        return jnp.concatenate(
            [rotate_vec3(rot, x[:, :3]), x[:, 3:4], rotate_vec3(rot, x[:, 4:])], axis=-1
        )
    if c == 8:
        return jnp.concatenate(
            [rotate_vec3(rot, x[:, :3]), x[:, 3:5], rotate_vec3(rot, x[:, 5:])], axis=-1
        )
    raise ValueError(f"unsupported channel count {c}")
