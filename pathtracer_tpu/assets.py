"""Asset resolution and procedural substitutes.

The reference loads models/textures from an `assets/` directory relative to
the working directory (e.g. teapot.go:80 reads "assets/teapot.obj",
texturedplanets.go:124-129 loads six texture images). Several of the texture
assets and glass.obj are missing from the reference repository itself
(SURVEY.md §2.4), so this module provides:

- a search path for real assets: $PT_ASSETS, ./assets, <repo>/assets
- deterministic procedural substitutes for anything not found, so every
  registered scene renders out of the box
"""
from __future__ import annotations

import math
import os
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def asset_search_paths() -> List[str]:
    paths = []
    env = os.environ.get("PT_ASSETS")
    if env:
        paths.append(env)
    paths.append(os.path.join(os.getcwd(), "assets"))
    paths.append(os.path.join(_REPO_ROOT, "assets"))
    # read the upstream reference's asset directory when it is mounted
    # alongside (models only — never code); procedural substitutes cover
    # the standalone case
    paths.append("/root/reference/assets")
    return paths


def find_asset(name: str) -> Optional[str]:
    for d in asset_search_paths():
        p = os.path.join(d, name)
        if os.path.isfile(p):
            return p
    return None


# ---------------------------------------------------------------------------
# Procedural meshes (fallbacks for missing .obj assets)
# ---------------------------------------------------------------------------

def uv_sphere_obj(n_lat: int = 24, n_lon: int = 32, name: str = "Sphere") -> str:
    """A .obj-format UV sphere (v + f lines only, like teapot.obj which has
    no vn records — exercises ComputeVertexNormals)."""
    lines = [f"g {name}"]
    verts = []
    for i in range(n_lat + 1):
        phi = math.pi * i / n_lat
        for j in range(n_lon):
            theta = 2.0 * math.pi * j / n_lon
            verts.append((
                math.sin(phi) * math.cos(theta),
                math.cos(phi),
                math.sin(phi) * math.sin(theta),
            ))
    for v in verts:
        lines.append(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}")

    def vid(i, j):
        return i * n_lon + (j % n_lon) + 1

    for i in range(n_lat):
        for j in range(n_lon):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j + 1), vid(i + 1, j)
            if i > 0:
                lines.append(f"f {a} {b} {c}")
            if i < n_lat - 1:
                lines.append(f"f {a} {c} {d}")
    return "\n".join(lines)


def goblet_obj(n_seg: int = 32, name: str = "Glass") -> str:
    """Procedural stand-in for the missing glass.obj: a lathed goblet
    profile (bowl + stem + foot), two named groups like the reference's
    glass() loader expects (transparent_glass.go:121-134)."""
    # lathe profile: (radius, y) pairs bottom->top
    profile = [
        (0.001, 0.0), (0.9, 0.0), (0.95, 0.05), (0.3, 0.1), (0.15, 0.15),
        (0.12, 1.2), (0.3, 1.4), (0.75, 1.8), (0.95, 2.4), (1.0, 3.0),
    ]
    lines = [f"g {name}Bowl"]
    verts = []
    for r, y in profile:
        for j in range(n_seg):
            t = 2.0 * math.pi * j / n_seg
            verts.append((r * math.cos(t), y, r * math.sin(t)))
    for v in verts:
        lines.append(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}")

    def vid(i, j):
        return i * n_seg + (j % n_seg) + 1

    half = len(profile) // 2
    for i in range(len(profile) - 1):
        if i == half:
            lines.append(f"g {name}Stem")
        for j in range(n_seg):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j + 1), vid(i + 1, j)
            lines.append(f"f {a} {b} {c}")
            lines.append(f"f {a} {c} {d}")
    return "\n".join(lines)


def load_obj_source(name: str) -> str:
    """Return .obj text for `name`, real file if found, else a procedural
    substitute (the reference panics on missing assets, teapot.go:80-83;
    we degrade gracefully so all 15 scenes always run)."""
    p = find_asset(name)
    if p is not None:
        with open(p) as f:
            return f.read()
    if name == "glass.obj":
        return goblet_obj()
    return uv_sphere_obj(name=os.path.splitext(name)[0])


# ---------------------------------------------------------------------------
# Procedural textures (all deterministic; [H, W, 3] float32 in [0, 1])
# ---------------------------------------------------------------------------

def _value_noise(h: int, w: int, cells: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    grid = rng.random((cells + 1, cells + 1), dtype=np.float32)
    ys = np.linspace(0, cells, h, endpoint=False)
    xs = np.linspace(0, cells, w, endpoint=False)
    y0 = ys.astype(int); x0 = xs.astype(int)
    fy = (ys - y0)[:, None]; fx = (xs - x0)[None, :]
    fy = fy * fy * (3 - 2 * fy); fx = fx * fx * (3 - 2 * fx)
    a = grid[np.ix_(y0, x0)]; b = grid[np.ix_(y0, x0 + 1)]
    c = grid[np.ix_(y0 + 1, x0)]; d = grid[np.ix_(y0 + 1, x0 + 1)]
    return a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx + c * fy * (1 - fx) + d * fy * fx


def checker_texture(h: int = 512, w: int = 512, n: int = 8,
                    c1=(0.9, 0.9, 0.9), c2=(0.2, 0.2, 0.2)) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    mask = ((yy * n // h) + (xx * n // w)) % 2 == 0
    out = np.where(mask[..., None], np.float32(c1), np.float32(c2))
    return out.astype(np.float32)


def squares_texture(h: int = 512, w: int = 512) -> np.ndarray:
    """Stand-in for concrete_squares.png: grout lines over noisy concrete."""
    base = 0.55 + 0.25 * _value_noise(h, w, 16, seed=7)[..., None]
    yy, xx = np.mgrid[0:h, 0:w]
    line = ((yy % (h // 8)) < 3) | ((xx % (w // 8)) < 3)
    img = np.repeat(base, 3, axis=2)
    img[line] *= 0.45
    return img.astype(np.float32)


def squares_normal_map(h: int = 512, w: int = 512) -> np.ndarray:
    """Normal-map stand-in for concrete_squares_nm2.png: beveled edges at
    the grout lines. Texel values must be in [0,1] like any 8-bit image —
    the kernel normalizes the raw texel and uses it as the normal
    (tracer.cl:907-911), so bevels are encoded as small x/z excursions on
    a dominant y component."""
    yy, xx = np.mgrid[0:h, 0:w]
    px = (xx % (w // 8)).astype(np.float32)
    py = (yy % (h // 8)).astype(np.float32)
    nx = np.where(px < 3, 0.1, np.where(px > (w // 8) - 4, 0.5, 0.3))
    nz = np.where(py < 3, 0.1, np.where(py > (h // 8) - 4, 0.5, 0.3))
    ny = np.full_like(nx, 0.9)
    return np.stack([nx, ny, nz], axis=-1).astype(np.float32)


def cobblestone_texture(h: int = 512, w: int = 512) -> np.ndarray:
    n1 = _value_noise(h, w, 24, seed=11)
    n2 = _value_noise(h, w, 6, seed=13)
    g = 0.35 + 0.3 * n1 + 0.2 * n2
    return np.stack([g, g * 0.95, g * 0.85], axis=-1).astype(np.float32)


def floorboards_texture(h: int = 512, w: int = 512) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    grain = _value_noise(h, w, 64, seed=17)
    plank = (yy * 8 // h).astype(np.float32) / 8.0
    g = 0.45 + 0.12 * grain + 0.08 * plank
    line = (yy % (h // 8)) < 2
    img = np.stack([g * 1.0, g * 0.72, g * 0.45], axis=-1)
    img[line] *= 0.5
    return img.astype(np.float32)


def planet_texture(h: int = 512, w: int = 1024, seed: int = 23) -> np.ndarray:
    """2:1 equirectangular planet: continents over ocean."""
    n = _value_noise(h, w, 12, seed=seed) + 0.5 * _value_noise(h, w, 48, seed=seed + 1)
    land = n > 0.75
    img = np.empty((h, w, 3), dtype=np.float32)
    img[...] = (0.05, 0.15, 0.45)
    img[land] = (0.15, 0.5, 0.2)
    polar = np.abs(np.linspace(-1, 1, h))[:, None] > 0.88
    img[np.repeat(polar, w, axis=1)] = (0.95, 0.95, 0.98)
    return img


def jupiter_texture(h: int = 512, w: int = 1024) -> np.ndarray:
    yy = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    bands = 0.5 + 0.25 * np.sin(yy * 40.0) + 0.1 * _value_noise(h, w, 20, seed=31)
    img = np.stack([bands * 1.0, bands * 0.8, bands * 0.6], axis=-1)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def sky_sphere_texture(h: int = 1024, w: int = 2048) -> np.ndarray:
    """Stand-in for alps_field_8k.png: 2:1 sky gradient + ground + sun."""
    v = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None, None]  # 0=top
    sky = (1 - v) * np.float32((0.35, 0.55, 0.95)) + v * np.float32((0.85, 0.9, 1.0))
    img = np.broadcast_to(sky, (h, w, 3)).copy()
    ground = v[..., 0] > 0.62
    gmask = np.broadcast_to(ground, (h, w))
    img[gmask] = (0.25, 0.4, 0.18)
    yy, xx = np.mgrid[0:h, 0:w]
    sun = ((yy - 0.25 * h) ** 2 + (xx - 0.7 * w) ** 2) < (0.03 * h) ** 2
    img[sun] = (1.0, 0.98, 0.9)
    return img.astype(np.float32)


def cubemap_cross_texture(face: int = 256) -> np.ndarray:
    """Stand-in for shrine_cubemap.jpeg in the 4x3 cross layout the kernel
    samples (tracer.cl:113-147): +X right, -X left, +Y top, -Y bottom,
    +Z front, -Z back."""
    h, w = 3 * face, 4 * face
    img = np.zeros((h, w, 3), dtype=np.float32)
    sky = (0.4, 0.6, 0.95)
    ground = (0.3, 0.25, 0.2)
    # side faces: left, front, right, back across the middle row
    for k, tint in enumerate([(1.0, 0.9, 0.8), (0.9, 1.0, 0.9),
                              (0.8, 0.9, 1.0), (1.0, 1.0, 0.85)]):
        v = np.linspace(0, 1, face, dtype=np.float32)[:, None, None]
        col = (1 - v) * np.float32(sky) + v * np.float32(ground)
        img[face:2 * face, k * face:(k + 1) * face] = col * np.float32(tint)
    img[0:face, face:2 * face] = sky          # top face
    img[2 * face:3 * face, face:2 * face] = ground  # bottom face
    return img


def load_texture(name: str) -> np.ndarray:
    """Real image if present in the asset path, procedural otherwise."""
    p = find_asset(name)
    if p is not None:
        from .io.png import load_image
        return load_image(p)
    gen = {
        "concrete_squares.png": squares_texture,
        "concrete_squares_nm2.png": squares_normal_map,
        "seamless-cobblestone-texture.jpg": cobblestone_texture,
        "floor_boards.png": floorboards_texture,
        "planet.png": planet_texture,
        "jupiter2_6k_contrast.png": jupiter_texture,
        "alps_field_8k.png": sky_sphere_texture,
        "shrine_cubemap.jpeg": cubemap_cross_texture,
    }
    if name in gen:
        return gen[name]()
    return checker_texture()
