"""SoA 3-vectors: three separate [R] arrays.

THE core TPU layout decision. XLA:TPU tiles the last two array dims to
(8, 128) physical lanes, so an [R, 3] ray buffer is padded 3 -> 128 — a 42x
physical-memory blowup, and a gathered [R, 4, 4] matrix buffer becomes 32x
(observed: a 629MB logical buffer allocating 20.1GB HBM and OOMing compile).
Structure-of-arrays [R]-per-component keeps every buffer dense: R pads to a
multiple of 1024, i.e. ~0% waste at render batch sizes.

Vec3 is a pytree (NamedTuple), so it carries through jit/scan/while_loop.
"""
from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp

Scalar = Union[float, jnp.ndarray]


class Vec3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- arithmetic ----------------------------------------------------
    def __add__(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __neg__(self) -> "Vec3":
        return Vec3(-self.x, -self.y, -self.z)

    def __mul__(self, s) -> "Vec3":
        if isinstance(s, Vec3):  # hadamard
            return Vec3(self.x * s.x, self.y * s.y, self.z * s.z)
        return Vec3(self.x * s, self.y * s, self.z * s)

    __rmul__ = __mul__

    def dot(self, o: "Vec3") -> jnp.ndarray:
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o: "Vec3") -> "Vec3":
        return Vec3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def norm(self) -> jnp.ndarray:
        return jnp.sqrt(self.dot(self))

    def normalized(self) -> "Vec3":
        inv = 1.0 / self.norm()
        return Vec3(self.x * inv, self.y * inv, self.z * inv)

    def reflect(self, n: "Vec3") -> "Vec3":
        """self - n * 2*dot(self, n) (tracer.cl:985-987)."""
        d = 2.0 * self.dot(n)
        return Vec3(self.x - n.x * d, self.y - n.y * d, self.z - n.z * d)

    def abs(self) -> "Vec3":
        return Vec3(jnp.abs(self.x), jnp.abs(self.y), jnp.abs(self.z))

    def max_component(self) -> jnp.ndarray:
        return jnp.maximum(jnp.maximum(self.x, self.y), self.z)

    def min_component(self) -> jnp.ndarray:
        return jnp.minimum(jnp.minimum(self.x, self.y), self.z)

    # -- selection / construction ---------------------------------------
    @staticmethod
    def where(mask: jnp.ndarray, a: "Vec3", b: "Vec3") -> "Vec3":
        return Vec3(
            jnp.where(mask, a.x, b.x),
            jnp.where(mask, a.y, b.y),
            jnp.where(mask, a.z, b.z),
        )

    @staticmethod
    def full(shape, x: float, y: float, z: float, dtype=jnp.float32) -> "Vec3":
        return Vec3(
            jnp.full(shape, x, dtype=dtype),
            jnp.full(shape, y, dtype=dtype),
            jnp.full(shape, z, dtype=dtype),
        )

    @staticmethod
    def zeros(shape, dtype=jnp.float32) -> "Vec3":
        z = jnp.zeros(shape, dtype=dtype)
        return Vec3(z, z, z)

    @staticmethod
    def from_array(a: jnp.ndarray) -> "Vec3":
        """[..., 3] -> Vec3 of [...]."""
        return Vec3(a[..., 0], a[..., 1], a[..., 2])

    def to_array(self) -> jnp.ndarray:
        return jnp.stack([self.x, self.y, self.z], axis=-1)


def mat_apply_point(m: jnp.ndarray, p: Vec3) -> Vec3:
    """Apply a single (traced-scalar-element) 4x4 matrix to a Vec3 point.
    m elements are scalars — broadcast multiplies, no gathers, no padding."""
    return Vec3(
        m[0, 0] * p.x + m[0, 1] * p.y + m[0, 2] * p.z + m[0, 3],
        m[1, 0] * p.x + m[1, 1] * p.y + m[1, 2] * p.z + m[1, 3],
        m[2, 0] * p.x + m[2, 1] * p.y + m[2, 2] * p.z + m[2, 3],
    )


def mat_apply_vector(m: jnp.ndarray, v: Vec3) -> Vec3:
    return Vec3(
        m[0, 0] * v.x + m[0, 1] * v.y + m[0, 2] * v.z,
        m[1, 0] * v.x + m[1, 1] * v.y + m[1, 2] * v.z,
        m[2, 0] * v.x + m[2, 1] * v.y + m[2, 2] * v.z,
    )


def mat_gather_apply_point(m_cols: jnp.ndarray, oi: jnp.ndarray, p: Vec3) -> Vec3:
    """Apply per-ray-selected matrices stored as [No, 12] row-major
    (3x4 affine) by gathering 12 [R] scalar streams."""
    g = lambda k: m_cols[oi, k]
    return Vec3(
        g(0) * p.x + g(1) * p.y + g(2) * p.z + g(3),
        g(4) * p.x + g(5) * p.y + g(6) * p.z + g(7),
        g(8) * p.x + g(9) * p.y + g(10) * p.z + g(11),
    )


def mat_gather_apply_vector(m_cols: jnp.ndarray, oi: jnp.ndarray, v: Vec3) -> Vec3:
    g = lambda k: m_cols[oi, k]
    return Vec3(
        g(0) * v.x + g(1) * v.y + g(2) * v.z,
        g(4) * v.x + g(5) * v.y + g(6) * v.z,
        g(8) * v.x + g(9) * v.y + g(10) * v.z,
    )
