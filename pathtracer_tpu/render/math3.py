"""Batched 3-vector / 4x4-matrix helpers for device code.

All functions operate on jnp arrays with a trailing axis of 3 and broadcast
over leading (ray) axes. The reference's AVX2 dot/cross and `mul` mat4*vec4
(tracer.cl:369-376, cfiles/*.c) map to these; XLA vectorizes them onto the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp


def dot3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1)


def cross3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def norm3(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def normalize3(a: jnp.ndarray) -> jnp.ndarray:
    return a / norm3(a)[..., None]


def reflect3(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """d - 2*dot(d,n)*n (tracer.cl:985-987)."""
    return d - n * (2.0 * dot3(d, n))[..., None]


def transform_point(m: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 matrix/matrices to 3-points (w=1).

    m: [..., 4, 4], p: [..., 3] with broadcastable leading dims.

    Implemented as elementwise multiply + reduce (VPU work) rather than
    dot_general: XLA's default matmul precision downcasts f32 contractions
    (bf16 passes on TPU), which is catastrophically wrong for ray/object
    transforms (a wall at z=0.4 moved by 6e-4 causes self-intersection
    acne). Elementwise ops always run at full f32.
    """
    return jnp.sum(m[..., :3, :3] * p[..., None, :], axis=-1) + m[..., :3, 3]


def transform_vector(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 matrix/matrices to 3-vectors (w=0). See transform_point
    for why this is not an einsum."""
    return jnp.sum(m[..., :3, :3] * v[..., None, :], axis=-1)
