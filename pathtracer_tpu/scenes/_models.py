"""Shared model-loading helpers for the scene library.

Mirrors the reference's per-scene loader idioms (teapot.go:79-104,
transparent_teapot.go:107-133, transparent_glass.go:117-140, gopher.go:66-82).
"""
from __future__ import annotations

import os

from ..assets import find_asset, load_obj_source
from ..scene.material import Material
from ..scene.objfile import compute_vertex_normals, parse_obj
from ..scene.shapes import Group


def load_model(name: str, normals_groups: int = 0) -> Group:
    """Parse `assets/<name>` (or a procedural substitute) into one ROOT
    group. If normals_groups != 0, compute smooth vertex normals over the
    triangles of the first N named groups BEFORE any transform, exactly as
    the reference loaders do (teapot.go:86-93: group.Children[0];
    transparent_glass.go:124-133: Children[0] and Children[1]).

    Uses the native scene-core parser when built (PT_NATIVE=0 disables) —
    triangles stay as arrays (Group.soup), skipping Python object
    construction entirely. The native path computes vertex normals over
    ALL triangles, which is identical for every reference scene (teapot
    has one group; glass uses all groups; gopher doesn't compute them).
    """
    from .. import native

    path = find_asset(name)
    mtl_dir = os.path.dirname(path) if path else "."
    text = load_obj_source(name)

    if native.available():
        mtl = None
        for row in text.split("\n"):
            row = row.strip()
            if row.startswith("mtllib"):
                from ..scene.objfile import parse_mtl
                with open(os.path.join(mtl_dir, row.split()[1])) as f:
                    mtl = parse_mtl(f.read())
                break
        soup = native.parse_obj(text, mtl=mtl,
                                compute_normals=normals_groups != 0)
        if soup is not None:
            group = Group(label="ROOT")
            group.soup = soup
            group.bounds()
            return group
        # native parse failed (returns None instead of crashing on
        # pathological input) — fall through to the Python parser

    model = parse_obj(text, mtl_dir=mtl_dir)
    group = model.to_group()

    if normals_groups != 0:
        n = len(group.children) if normals_groups < 0 else normals_groups
        tris = []
        for child in group.children[:n]:
            if isinstance(child, Group):
                tris.extend(t for t in child.children
                            if not isinstance(t, Group))
        compute_vertex_normals(tris)

    group.bounds()
    return group


def silver(reflectivity: float = 0.2) -> Material:
    m = Material.diffuse(0.75, 0.75, 0.75)
    m.reflectivity = reflectivity
    return m
