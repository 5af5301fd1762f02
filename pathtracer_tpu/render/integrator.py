"""Wavefront path-tracing integrator (SoA Vec3 layout, see vec3.py).

Behavioral equivalent of the reference megakernel's sample/bounce/resolve
loops (internal/ocl/tracer.cl:867-1187), restructured for TPU:

- the per-work-item bounce array bounce[16] + backward resolve pass
  (tracer.cl:1116-1176) is folded FORWARD into running (mask, accum) state,
  which is mathematically identical because the resolve is a prefix product
- all material branching (tracer.cl:982-1061) is branchless where-selects
  over the whole ray batch
- the RNG is counter-based threefry keyed on (pass, bounce); the reference's
  wall-clock-seeded sin-hash (tracer.cl:314, cmd/pt/main.go:19) is not
  reproducible by design, so parity is estimator-level, not bitwise

Semantics preserved exactly (all cited):
- max 10 bounces, max 4 "effective" bounces; reflection/refraction bounces
  are free (tracer.cl:884, 1098-1101)
- break on emissive hit; a light hit on the FIRST recorded bounce returns
  the light's color, not emission (tracer.cl:1107, 1156-1163)
- refraction pass-through bounces skip mask/accum updates (tracer.cl:1148)
- thin-shell refractiveIndex == -1 hack (tracer.cl:989-1004)
- reflectivity roulette, schlick-roulette refract/reflect with
  inside-tracking (tracer.cl:982, 1006-1054)
- cos = 1 for non-diffuse bounces (tracer.cl:975)
- per-triangle colors for BVH hits, emission forced to 0 (tracer.cl:672-673,
  1071-1073)
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..scene.pack import SceneArrays, SceneMeta
from ..scene.shapes import BOX, CYLINDER, GROUP, PLANE, SPHERE
from .camera import Camera, CameraArrays, rays_for_pixels
from .intersect import Hit, intersect_scene
from .sampling import random_vector_in_hemisphere, refracted_direction, schlick
from .uv import cube_uv, sample_texture, spherical_map
from .vec3 import Vec3, mat_gather_apply_vector


class PathState(NamedTuple):
    origin: Vec3
    direction: Vec3
    mask: Vec3
    accum: Vec3
    alive: jnp.ndarray     # [R] bool
    inside: jnp.ndarray    # [R] bool
    n_hits: jnp.ndarray    # [R] i32 recorded bounces
    eff: jnp.ndarray       # [R] i32 effective bounces


def _gather_vec(table: jnp.ndarray, idx: jnp.ndarray) -> Vec3:
    """Column gathers from a small [N, 3] table -> Vec3 of [R]."""
    return Vec3(table[idx, 0], table[idx, 1], table[idx, 2])


def _surface_normal(scn: SceneArrays, obj_type, lp: Vec3, tri_normal: Vec3,
                    is_tri, obj_idx, min_y, max_y, eps) -> Vec3:
    """Object-space normal by primitive type (tracer.cl:903-950)."""
    zero = jnp.zeros_like(lp.x)
    one = jnp.ones_like(zero)

    # PLANE: +Y, or normal-map texture (tracer.cl:906-914)
    n_plane = Vec3(zero, one, zero)
    has_nm = (scn.is_textured_nm[obj_idx] == 1) & (obj_type == PLANE)
    nm_sx = scn.texture_scale_nm[obj_idx, 0]
    nm_sy = scn.texture_scale_nm[obj_idx, 1]
    nm_rgb = sample_texture(
        scn.tex_planar, scn.texture_index_nm[obj_idx],
        jnp.abs(lp.x) * nm_sx, jnp.abs(lp.z) * nm_sy,
    ).normalized()
    n_plane = Vec3.where(has_nm, nm_rgb, n_plane)

    # SPHERE: local point minus origin (tracer.cl:915-920) -> lp itself

    # CYLINDER incl. cap normals (tracer.cl:921-932)
    dist = lp.x * lp.x + lp.z * lp.z
    top = (dist < 1.0) & (lp.y >= max_y - eps)
    bottom = (dist < 1.0) & (lp.y <= min_y + eps)
    n_cyl = Vec3.where(
        top, Vec3(zero, one, zero),
        Vec3.where(bottom, Vec3(zero, -one, zero), Vec3(lp.x, zero, lp.z)),
    )

    # CUBE: dominant axis (tracer.cl:933-946)
    a = lp.abs()
    maxc = a.max_component()
    sel_x = maxc == a.x
    sel_y = (~sel_x) & (maxc == a.y)
    n_box = Vec3.where(
        sel_x, Vec3(lp.x, zero, zero),
        Vec3.where(sel_y, Vec3(zero, lp.y, zero), Vec3(zero, zero, lp.z)),
    )

    n = Vec3.where(obj_type == PLANE, n_plane,
        Vec3.where(obj_type == SPHERE, lp,
        Vec3.where(obj_type == CYLINDER, n_cyl,
        Vec3.where(obj_type == BOX, n_box, tri_normal))))
    return Vec3.where(is_tri, tri_normal, n)


def _surface_color(scn: SceneArrays, obj_type, obj_idx, lp: Vec3,
                   tri_color: Vec3, is_tri) -> Vec3:
    """Surface color incl. texture lookups (tracer.cl:1075-1093)."""
    base = _gather_vec(scn.color, obj_idx)
    textured = scn.is_textured[obj_idx] == 1
    tex_idx = scn.texture_index[obj_idx]
    sx = scn.texture_scale[obj_idx, 0]
    sy = scn.texture_scale[obj_idx, 1]

    c_plane = sample_texture(scn.tex_planar, tex_idx, lp.x * sx, lp.z * sy)
    us, vs = spherical_map(lp)
    c_sphere = sample_texture(scn.tex_sphere, tex_idx, us, 1.0 - vs)
    uc, vc = cube_uv(lp)
    c_cube = sample_texture(scn.tex_cube, tex_idx, uc, vc)

    tex_color = Vec3.where(obj_type == PLANE, c_plane,
                Vec3.where(obj_type == SPHERE, c_sphere,
                Vec3.where(obj_type == BOX, c_cube, base)))
    color = Vec3.where(textured, tex_color, base)
    return Vec3.where(is_tri, tri_color, color)


def bounce_step(scn: SceneArrays, meta: SceneMeta, cfg: RenderConfig,
                state: PathState, key: jnp.ndarray) -> PathState:
    eps = cfg.epsilon
    R = state.origin.x.shape[0]
    dt = state.origin.x.dtype

    hit = intersect_scene(scn, meta, state.origin, state.direction, eps,
                          cfg.t_max)
    hit_ok = hit.t < cfg.t_max
    oi = hit.obj_idx

    obj_type = scn.obj_type[oi]

    position = state.origin + state.direction * hit.t
    eye = -state.direction
    # local hit point from the already-transformed per-object ray — no
    # per-ray matrix gather needed
    local_point = hit.local_origin + hit.local_dir * hit.t

    # triangle smooth normal n2*u + n3*v + n1*(1-u-v) (tracer.cl:669) and
    # per-triangle color, gathered once by winning slot
    slot = jnp.clip(hit.tri_slot, 0, scn.tri_p1.shape[0] - 1)
    w1 = 1.0 - hit.tri_u - hit.tri_v
    tri_normal = (
        _gather_vec(scn.tri_n2, slot) * hit.tri_u
        + _gather_vec(scn.tri_n3, slot) * hit.tri_v
        + _gather_vec(scn.tri_n1, slot) * w1
    )
    tri_color = _gather_vec(scn.tri_color, slot)

    n_local = _surface_normal(
        scn, obj_type, local_point, tri_normal, hit.is_tri, oi,
        scn.min_y[oi], scn.max_y[oi], eps,
    )
    normal = mat_gather_apply_vector(scn.inv_t_affine, oi, n_local).normalized()
    # face-forward (tracer.cl:962-964)
    normal = Vec3.where(eye.dot(normal) < 0.0, -normal, normal)

    over = position + normal * eps
    under = position - normal * eps

    # draw in f32 regardless of compute dtype so f64 golden renders consume
    # bit-identical uniforms (estimator parity across precisions)
    u_refl, u_schl, u1, u2 = jax.random.uniform(
        key, (4, R), dtype=jnp.float32
    ).astype(dt)

    refl = scn.reflectivity[oi]
    refr = scn.refractive_index[oi]

    # --- material roulette (tracer.cl:982-1061) -----------------------
    do_reflect = (refl != 0.0) & (u_refl < refl)

    thin = (~do_reflect) & (refr == -1.0)
    sch_thin = schlick(eye, normal, jnp.asarray(1.0, dt), jnp.asarray(1.5, dt))
    thin_pass = thin & (sch_thin < u_schl)
    thin_reflect = thin & ~(sch_thin < u_schl)

    solid = (~do_reflect) & (~thin) & (refr != 1.0)
    outside = ~state.inside
    sch = jnp.where(
        outside,
        schlick(eye, normal, jnp.asarray(1.0, dt), refr),
        schlick(eye, normal, refr, jnp.asarray(1.0, dt)),
    )
    do_refract = solid & (sch < u_schl)
    refract_dir = Vec3.where(
        outside,
        refracted_direction(eye, normal, jnp.asarray(1.0, dt), refr),
        refracted_direction(eye, normal, refr, jnp.asarray(1.0, dt)),
    )
    solid_reflect = solid & ~do_refract

    diffuse = (~do_reflect) & (~thin) & (~solid)
    hemi = random_vector_in_hemisphere(normal, u1, u2)

    reflect_dir = state.direction.reflect(normal)
    any_reflect = do_reflect | thin_reflect | solid_reflect

    new_dir = Vec3.where(any_reflect, reflect_dir,
              Vec3.where(thin_pass, state.direction,
              Vec3.where(do_refract, refract_dir, hemi)))
    cos = jnp.where(diffuse, hemi.dot(normal), jnp.asarray(1.0, dt))
    new_origin = Vec3.where(thin_pass | do_refract, under, over)

    entering = do_refract & outside
    exiting = do_refract & state.inside
    new_inside = jnp.where(do_refract, outside, state.inside)
    is_refraction = entering | exiting

    color = _surface_color(scn, obj_type, oi, local_point, tri_color,
                           hit.is_tri)
    zero = jnp.zeros_like(color.x)
    emission = Vec3.where(hit.is_tri, Vec3(zero, zero, zero),
                          _gather_vec(scn.emission, oi))

    # --- fold the resolve pass forward (tracer.cl:1116-1176) ----------
    rec = state.alive & hit_ok
    no_refr = rec & ~is_refraction
    is_light = emission.x > 0.0

    accum = state.accum + Vec3.where(
        no_refr, state.mask * emission, Vec3(zero, zero, zero)
    )
    direct = no_refr & is_light & (state.n_hits == 0)
    accum = Vec3.where(direct, color, accum)
    mask = Vec3.where(
        no_refr & ~is_light, state.mask * color * cos, state.mask
    )

    # effective bounces: everything except refraction transits and
    # reflections (tracer.cl:1098-1101) — note a thin-shell pass-through
    # sets neither entering/exiting nor reflecting, so it COUNTS
    eff = state.eff + jnp.where(rec & ~is_refraction & ~any_reflect, 1, 0)
    n_hits = state.n_hits + rec.astype(jnp.int32)
    alive = (
        state.alive & hit_ok & ~(rec & is_light)
        & (eff < cfg.max_effective_bounces)
    )

    return PathState(
        origin=Vec3.where(rec, new_origin, state.origin),
        direction=Vec3.where(rec, new_dir, state.direction),
        mask=mask,
        accum=accum,
        alive=alive,
        inside=jnp.where(rec, new_inside, state.inside),
        n_hits=n_hits,
        eff=eff,
    )


def render_rays(scn: SceneArrays, meta: SceneMeta, cfg: RenderConfig,
                origin: Vec3, direction: Vec3, key: jnp.ndarray) -> Vec3:
    """Trace a batch of primary rays to completion; returns accumulated
    radiance as Vec3 of [R] (one sample each)."""
    R = origin.x.shape[0]
    dt = origin.x.dtype
    state = PathState(
        origin=origin,
        direction=direction,
        mask=Vec3.full((R,), 1.0, 1.0, 1.0, dt),
        accum=Vec3.zeros((R,), dt),
        alive=jnp.ones((R,), dtype=bool),
        inside=jnp.zeros((R,), dtype=bool),
        n_hits=jnp.zeros((R,), dtype=jnp.int32),
        eff=jnp.zeros((R,), dtype=jnp.int32),
    )

    def body(b, s):
        return bounce_step(scn, meta, cfg, s, jax.random.fold_in(key, b))

    state = jax.lax.fori_loop(0, cfg.max_bounces, body, state)
    return state.accum


def render_pass(scn: SceneArrays, meta: SceneMeta, cfg: RenderConfig,
                cam: CameraArrays, px: jnp.ndarray, py: jnp.ndarray,
                sample0: jnp.ndarray, n_samples: int,
                key: jnp.ndarray) -> Vec3:
    """Render `n_samples` samples for each of P pixels; returns the SUM of
    sample radiances as Vec3 of [P] (caller divides by total spp)."""
    P = px.shape[0]
    S = n_samples
    dt = cam.inverse.dtype

    pxs = jnp.repeat(px, S)
    pys = jnp.repeat(py, S)
    sample_ids = sample0 + jnp.tile(jnp.arange(S, dtype=jnp.int32), P)

    kj = jax.random.fold_in(key, 1)
    jx, jy = jax.random.uniform(kj, (2, P * S), dtype=jnp.float32).astype(dt)
    origin, direction = rays_for_pixels(
        cam, pxs, pys, jx, jy, sample_ids, cfg.samples
    )
    acc = render_rays(scn, meta, cfg, origin, direction,
                      jax.random.fold_in(key, 2))
    return Vec3(
        acc.x.reshape(P, S).sum(axis=1),
        acc.y.reshape(P, S).sum(axis=1),
        acc.z.reshape(P, S).sum(axis=1),
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 6))
def _render_tile_jit(scn, meta, cfg, cam, px, py, n_chunks, key):
    S = cfg.samples_per_pass

    def chunk(c, acc):
        k = jax.random.fold_in(key, c)
        s0 = (c * S).astype(jnp.int32)
        return acc + render_pass(scn, meta, cfg, cam, px, py, s0, S, k)

    init = Vec3.zeros((px.shape[0],), cam.inverse.dtype)
    return jax.lax.fori_loop(0, n_chunks, chunk, init)


def render(scn: SceneArrays, meta: SceneMeta, camera: Camera,
           cfg: RenderConfig, key: Optional[jnp.ndarray] = None) -> np.ndarray:
    """Full-image render on the local device. Returns [H, W, 3] float32.

    Equivalent of the reference's ocl.Trace host loop (ocltracer.go:100-223)
    but with sample-chunk batching inside jit instead of 4-row watchdog
    batches.
    """
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    W, H = camera.width, camera.height
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    cam = camera.pack(dtype)

    spp_chunk = min(cfg.samples_per_pass, cfg.samples)
    cfg = cfg.replace(samples_per_pass=spp_chunk)
    n_chunks = max(1, cfg.samples // spp_chunk)

    rows = cfg.rows_per_pass or H
    out = np.zeros((H, W, 3), dtype=np.float32)
    for y0 in range(0, H, rows):
        y1 = min(y0 + rows, H)
        ys, xs = np.mgrid[y0:y1, 0:W]
        px = jnp.asarray(xs.ravel(), jnp.int32)
        py = jnp.asarray(ys.ravel(), jnp.int32)
        tile = _render_tile_jit(scn, meta, cfg, cam, px, py, n_chunks,
                                jax.random.fold_in(key, y0))
        stacked = np.stack(
            [np.asarray(tile.x), np.asarray(tile.y), np.asarray(tile.z)],
            axis=-1,
        ).astype(np.float32)
        out[y0:y1] = stacked.reshape(y1 - y0, W, 3)

    return out / float(cfg.samples)
