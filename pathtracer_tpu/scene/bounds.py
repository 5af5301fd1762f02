"""Axis-aligned bounding boxes (reference: internal/app/shapes/boundingbox.go)."""
from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from .shapes import Shape


class BoundingBox:
    def __init__(self, min_p: np.ndarray, max_p: np.ndarray):
        self.min = np.asarray(min_p, dtype=np.float64).copy()
        self.max = np.asarray(max_p, dtype=np.float64).copy()

    @staticmethod
    def empty() -> "BoundingBox":
        return BoundingBox(
            np.array([np.inf, np.inf, np.inf, 1.0]),
            np.array([-np.inf, -np.inf, -np.inf, 1.0]),
        )

    @staticmethod
    def of_floats(x1, y1, z1, x2, y2, z2) -> "BoundingBox":
        return BoundingBox(
            np.array([x1, y1, z1, 1.0]), np.array([x2, y2, z2, 1.0])
        )

    def contains_point(self, p: np.ndarray) -> bool:
        return bool(
            np.all(self.min[:3] <= p[:3]) and np.all(self.max[:3] >= p[:3])
        )

    def contains_box(self, b: "BoundingBox") -> bool:
        return self.contains_point(b.min) and self.contains_point(b.max)

    def add_point(self, p: np.ndarray) -> None:
        self.min[:3] = np.minimum(self.min[:3], p[:3])
        self.max[:3] = np.maximum(self.max[:3], p[:3])

    def merge_with(self, b: "BoundingBox") -> None:
        self.add_point(b.min)
        self.add_point(b.max)


def transform_bounding_box(bbox: BoundingBox, m: np.ndarray) -> BoundingBox:
    """Transform all 8 corners and re-box (boundingbox.go:67)."""
    mn, mx = bbox.min, bbox.max
    out = BoundingBox.empty()
    for x in (mn[0], mx[0]):
        for y in (mn[1], mx[1]):
            for z in (mn[2], mx[2]):
                p = m @ np.array([x, y, z, 1.0])
                out.add_point(p)
    return out


def bounds_of(shape: "Shape") -> BoundingBox:
    """Per-shape local-space bounds (boundingbox.go:89 BoundsOf):
    Group -> recursive over children's parent-space bounds,
    Triangle -> from vertices, default -> unit box."""
    from .shapes import Group, Triangle

    if isinstance(shape, Group):
        box = BoundingBox.empty()
        for c in shape.children:
            box.merge_with(parent_space_bounds(c))
        return box
    if isinstance(shape, Triangle):
        box = BoundingBox.empty()
        box.add_point(shape.p1)
        box.add_point(shape.p2)
        box.add_point(shape.p3)
        return box
    return BoundingBox.of_floats(-1, -1, -1, 1, 1, 1)


def parent_space_bounds(shape: "Shape") -> BoundingBox:
    """Local bounds transformed into the parent's space (boundingbox.go:62)."""
    return transform_bounding_box(bounds_of(shape), shape.transform)
