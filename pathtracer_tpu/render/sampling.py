"""Sampling and reflection/refraction math (SoA Vec3 forms).

Behavioral equivalents of internal/ocl/tracer.cl helpers:
- sunflower aperture points (tracer.cl:221-248)
- randomVectorInHemisphere (tracer.cl:348-366)
- randomPointOnSphere (tracer.cl:321-336)
- schlick (tracer.cl:485-505)
- computeRefractedRay (tracer.cl:507-533)

RNG: the reference's noise3D sin-fract hash (tracer.cl:314-317) is replaced
by counter-based threefry keys (deterministic, reproducible, device-local;
SURVEY.md section 2.3 RNG distribution row).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

from .vec3 import Vec3

# host constant — a jnp expression here would initialize the jax backend
# at import time, which breaks jax.distributed.initialize ordering on
# multi-host (tests/_multihost_worker.py)
_GOLDEN = (math.sqrt(5.0) + 1.0) / 2.0


def sunflower(amount_points: int, alpha: float, point_number: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evenly distribute points in a unit disc (tracer.cl:235-248).
    point_number may be a float array; randomize=false path only (the
    reference always calls it with randomize=false, tracer.cl:766)."""
    n = jnp.asarray(float(amount_points), dtype=point_number.dtype)
    b = jnp.round(alpha * jnp.sqrt(n))  # boundary point count
    r = jnp.where(
        point_number <= (n - b),
        jnp.sqrt(jnp.maximum(point_number - 0.5, 0.0))
        / jnp.sqrt(n - (b + 1.0) / 2.0),
        1.0,
    )
    phi2 = _GOLDEN * _GOLDEN
    theta = 2.0 * jnp.pi * point_number / phi2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def random_vector_in_hemisphere(normal: Vec3, u1: jnp.ndarray,
                                u2: jnp.ndarray) -> Vec3:
    """Cosine-ish-weighted hemisphere direction about `normal`
    (tracer.cl:348-366)."""
    rand1 = 2.0 * jnp.pi * u1
    rand2s = jnp.sqrt(u2)

    # axis = |n.x| > 0.1 ? (0,1,0) : (1,0,0)  (tracer.cl:355-359)
    pick = jnp.abs(normal.x) > 0.1
    zero = jnp.zeros_like(normal.x)
    one = jnp.ones_like(normal.x)
    axis = Vec3(jnp.where(pick, zero, one), jnp.where(pick, one, zero), zero)
    u = axis.cross(normal).normalized()
    v = normal.cross(u)
    cu = jnp.cos(rand1) * rand2s
    cv = jnp.sin(rand1) * rand2s
    cn = jnp.sqrt(1.0 - u2)
    return Vec3(
        u.x * cu + v.x * cv + normal.x * cn,
        u.y * cu + v.y * cv + normal.y * cn,
        u.z * cu + v.z * cv + normal.z * cn,
    )


def random_point_on_sphere(r: float, u1: jnp.ndarray, u2: jnp.ndarray) -> Vec3:
    """Reference's randomPointOnSphere (tracer.cl:321-336), kept verbatim
    including its idiosyncratic latitude offset (used only by NEE)."""
    lat = jnp.arccos(2.0 * u1 - 1.0) - jnp.pi * 2.0
    lon = 2.0 * jnp.pi * u2
    return Vec3(
        jnp.cos(lat) * jnp.cos(lon) * r,
        (jnp.sin(lat) - jnp.pi * 0.25) * r,
        jnp.cos(lat) * jnp.sin(lon) * r,
    )


def schlick(eye_vec: Vec3, normal_vec: Vec3, n1, n2) -> jnp.ndarray:
    """Schlick reflectance approximation (tracer.cl:485-505)."""
    dt = eye_vec.x.dtype
    n1 = jnp.asarray(n1, dtype=dt)
    n2 = jnp.asarray(n2, dtype=dt)
    cos = eye_vec.dot(normal_vec)

    n = n1 / n2
    sin2t = (n * n) * (1.0 - cos * cos)
    tir = (n1 > n2) & (sin2t > 1.0)
    cos_t = jnp.sqrt(jnp.clip(1.0 - sin2t, 0.0, None))
    cos_eff = jnp.where(n1 > n2, cos_t, cos)

    temp = (n1 - n2) / (n1 + n2)
    r0 = temp * temp
    res = r0 + (1.0 - r0) * (1.0 - cos_eff) ** 5
    return jnp.where(tir, 1.0, res)


def refracted_direction(eye_vec: Vec3, normal_vec: Vec3, n1, n2) -> Vec3:
    """Refracted ray direction (tracer.cl:507-533); zero vector on total
    internal reflection (unreachable through the callers' schlick roulette,
    since TIR implies schlick()==1)."""
    dt = eye_vec.x.dtype
    cos_i = eye_vec.dot(normal_vec)
    ratio = jnp.broadcast_to(
        jnp.asarray(n1, dt) / jnp.asarray(n2, dt), cos_i.shape
    )
    sin2t = (ratio * ratio) * (1.0 - cos_i * cos_i)
    cos_t = jnp.sqrt(jnp.clip(1.0 - sin2t, 0.0, None))
    k = ratio * cos_i - cos_t
    ok = sin2t <= 1.0
    return Vec3(
        jnp.where(ok, normal_vec.x * k - eye_vec.x * ratio, 0.0),
        jnp.where(ok, normal_vec.y * k - eye_vec.y * ratio, 0.0),
        jnp.where(ok, normal_vec.z * k - eye_vec.z * ratio, 0.0),
    )
