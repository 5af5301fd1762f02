"""Camera: fov -> half-extents/pixel size, look-at view transform, and the
batched primary-ray generator with AA jitter and sunflower-aperture DoF.

Behavioral equivalent of reference camera.NewCamera (camera/camera.go:21-48)
and the device-side rayForPixel (internal/ocl/tracer.cl:745-779).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..geometry import transforms as gx
from ..geometry import matrix as gm
from .sampling import sunflower
from .vec3 import Vec3, mat_apply_point


class Camera:
    """Host-side camera (camera/camera.go:8-48)."""

    def __init__(self, width: int, height: int, fov: float,
                 from_p: np.ndarray, look_at: np.ndarray,
                 aperture: float = 0.0, focal_length: float = 0.0):
        half_view = math.tan(fov / 2.0)
        aspect = width / height
        if aspect >= 1.0:
            half_width, half_height = half_view, half_view / aspect
        else:
            half_width, half_height = half_view * aspect, half_view
        self.width = width
        self.height = height
        self.fov = fov
        self.pixel_size = (half_width * 2.0) / width
        self.half_width = half_width
        self.half_height = half_height
        self.aperture = aperture
        self.focal_length = focal_length
        self.transform = gx.view_transform(
            np.asarray(from_p, dtype=np.float64),
            np.asarray(look_at, dtype=np.float64),
            np.array([0.0, 1.0, 0.0, 0.0]),
        )
        self.inverse = gm.inverse(self.transform)

    def pack(self, dtype=jnp.float32) -> "CameraArrays":
        return CameraArrays(
            inverse=jnp.asarray(self.inverse, dtype=dtype),
            pixel_size=jnp.asarray(self.pixel_size, dtype=dtype),
            half_width=jnp.asarray(self.half_width, dtype=dtype),
            half_height=jnp.asarray(self.half_height, dtype=dtype),
            aperture=jnp.asarray(self.aperture, dtype=dtype),
            focal_length=jnp.asarray(self.focal_length, dtype=dtype),
        )


class CameraArrays(NamedTuple):
    """Device-side camera parameters (reference CLCamera, ocltracer.go:80-96)."""
    inverse: jnp.ndarray      # [4,4]
    pixel_size: jnp.ndarray   # scalar
    half_width: jnp.ndarray
    half_height: jnp.ndarray
    aperture: jnp.ndarray
    focal_length: jnp.ndarray


def rays_for_pixels(
    cam: CameraArrays,
    px: jnp.ndarray,         # [R] pixel x (int or float)
    py: jnp.ndarray,         # [R] pixel y
    jitter_x: jnp.ndarray,   # [R] in [0,1)
    jitter_y: jnp.ndarray,   # [R]
    sample_idx: jnp.ndarray, # [R] int sample number n
    total_samples: int,
) -> Tuple[Vec3, Vec3]:
    """Batched rayForPixel (tracer.cl:745-779). Returns (origin, direction)
    as SoA Vec3 of [R]. Matches the reference exactly, including:
    - view-plane point at z=-1 through the camera inverse
    - NO normalization of the DoF direction (tracer.cl:774)
    - the reference's swapped sunflower x/y aperture offsets (tracer.cl:768-769)
    """
    dt = cam.inverse.dtype
    x_off = cam.pixel_size * (px.astype(dt) + jitter_x)
    y_off = cam.pixel_size * (py.astype(dt) + jitter_y)

    point_in_view = Vec3(
        cam.half_width - x_off,
        cam.half_height - y_off,
        -jnp.ones_like(x_off),
    )
    pixel = mat_apply_point(cam.inverse, point_in_view)
    zero = jnp.zeros_like(x_off)
    origin = mat_apply_point(cam.inverse, Vec3(zero, zero, zero))
    direction = (pixel - origin).normalized()

    # DoF branch (both branches are cheap; select elementwise)
    focal_point = origin + direction * cam.focal_length
    sx, sy = sunflower(total_samples, 2.0, sample_idx.astype(dt))
    dof_origin = Vec3(
        origin.x + sy * cam.aperture,  # note: sy -> x (reference swap)
        origin.y + sx * cam.aperture,
        origin.z,
    )
    dof_dir = focal_point - dof_origin

    use_dof = cam.aperture != 0.0
    return (
        Vec3.where(use_dof, dof_origin, origin),
        Vec3.where(use_dof, dof_dir, direction),
    )
