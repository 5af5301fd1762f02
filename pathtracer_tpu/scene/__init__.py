"""Host-side scene graph, materials, BVH build, OBJ parsing, and flattening
to the static struct-of-arrays device scene layout."""
from .material import Material
from .shapes import Plane, Sphere, Cube, Cylinder, Triangle, Group, Shape
from .bounds import BoundingBox, bounds_of, parent_space_bounds, transform_bounding_box
from .bvh import split_bounds, partition_children, divide, build_bvh
from .pack import SceneArrays, SceneMeta, pack_scene, Scene

__all__ = [
    "Material",
    "Plane", "Sphere", "Cube", "Cylinder", "Triangle", "Group", "Shape",
    "BoundingBox", "bounds_of", "parent_space_bounds", "transform_bounding_box",
    "split_bounds", "partition_children", "divide", "build_bvh",
    "SceneArrays", "SceneMeta", "pack_scene", "Scene",
]
