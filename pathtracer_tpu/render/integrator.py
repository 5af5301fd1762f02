"""Wavefront path-tracing integrator.

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
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..scene.pack import SceneArrays, SceneMeta
from ..scene.shapes import BOX, CYLINDER, GROUP, PLANE, SPHERE
from .camera import Camera, CameraArrays, rays_for_pixels
from .intersect import intersect_scene
from .math3 import dot3, normalize3, reflect3, transform_point, transform_vector
from .sampling import random_vector_in_hemisphere, refracted_direction, schlick
from .uv import cube_uv, sample_texture, spherical_map


class PathState(NamedTuple):
    origin: jnp.ndarray    # [R,3]
    direction: jnp.ndarray # [R,3]
    mask: jnp.ndarray      # [R,3]
    accum: jnp.ndarray     # [R,3]
    alive: jnp.ndarray     # [R] bool
    inside: jnp.ndarray    # [R] bool
    n_hits: jnp.ndarray    # [R] i32 recorded bounces
    eff: jnp.ndarray       # [R] i32 effective bounces


def _surface_normal(scn: SceneArrays, obj_type, local_point, tri_normal,
                    is_tri, obj_idx, min_y, max_y, eps):
    """Object-space normal by primitive type (tracer.cl:903-950)."""
    lp = local_point
    zero = jnp.zeros_like(lp[..., 0])
    one = jnp.ones_like(zero)

    # PLANE: +Y, or normal-map texture (tracer.cl:906-914)
    n_plane = jnp.stack([zero, one, zero], axis=-1)
    has_nm = scn.is_textured_nm[obj_idx] == 1
    # normal-map lookup at (|x|*sx, |z|*sy) from the planar atlas
    nm_scale = scn.texture_scale_nm[obj_idx]
    nm_rgb = sample_texture(
        scn.tex_planar,
        scn.texture_index_nm[obj_idx],
        jnp.abs(lp[..., 0]) * nm_scale[..., 0],
        jnp.abs(lp[..., 2]) * nm_scale[..., 1],
    )
    n_plane = jnp.where(
        (has_nm & (obj_type == PLANE))[..., None],
        normalize3(nm_rgb), n_plane,
    )

    # SPHERE: local point minus origin (tracer.cl:915-920)
    n_sphere = lp

    # CYLINDER incl. cap normals (tracer.cl:921-932)
    dist = lp[..., 0] ** 2 + lp[..., 2] ** 2
    top = (dist < 1.0) & (lp[..., 1] >= max_y - eps)
    bottom = (dist < 1.0) & (lp[..., 1] <= min_y + eps)
    n_cyl_side = jnp.stack([lp[..., 0], zero, lp[..., 2]], axis=-1)
    n_cyl = jnp.where(
        top[..., None], jnp.stack([zero, one, zero], axis=-1),
        jnp.where(bottom[..., None], jnp.stack([zero, -one, zero], axis=-1),
                  n_cyl_side),
    )

    # CUBE: dominant axis (tracer.cl:933-946)
    a = jnp.abs(lp)
    maxc = jnp.maximum(jnp.maximum(a[..., 0], a[..., 1]), a[..., 2])
    sel_x = maxc == a[..., 0]
    sel_y = (~sel_x) & (maxc == a[..., 1])
    n_box = jnp.where(
        sel_x[..., None], jnp.stack([lp[..., 0], zero, zero], axis=-1),
        jnp.where(sel_y[..., None], jnp.stack([zero, lp[..., 1], zero], axis=-1),
                  jnp.stack([zero, zero, lp[..., 2]], axis=-1)),
    )

    n = jnp.where((obj_type == PLANE)[..., None], n_plane,
        jnp.where((obj_type == SPHERE)[..., None], n_sphere,
        jnp.where((obj_type == CYLINDER)[..., None], n_cyl,
        jnp.where((obj_type == BOX)[..., None], n_box, tri_normal))))
    return jnp.where(is_tri[..., None], tri_normal, n)


def _surface_color(scn: SceneArrays, obj_type, obj_idx, local_point,
                   tri_color, is_tri):
    """Surface color incl. texture lookups (tracer.cl:1075-1093)."""
    base = scn.color[obj_idx]
    textured = scn.is_textured[obj_idx] == 1
    tex_idx = scn.texture_index[obj_idx]
    ts = scn.texture_scale[obj_idx]

    lp = local_point
    c_plane = sample_texture(
        scn.tex_planar, tex_idx, lp[..., 0] * ts[..., 0], lp[..., 2] * ts[..., 1]
    )
    uv_s = spherical_map(lp)
    c_sphere = sample_texture(
        scn.tex_sphere, tex_idx, uv_s[..., 0], 1.0 - uv_s[..., 1]
    )
    uv_c = cube_uv(lp)
    c_cube = sample_texture(scn.tex_cube, tex_idx, uv_c[..., 0], uv_c[..., 1])

    tex_color = jnp.where((obj_type == PLANE)[..., None], c_plane,
                jnp.where((obj_type == SPHERE)[..., None], c_sphere,
                jnp.where((obj_type == BOX)[..., None], c_cube, base)))
    color = jnp.where(textured[..., None], tex_color, base)
    return jnp.where(is_tri[..., None], tri_color, color)


def bounce_step(scn: SceneArrays, meta: SceneMeta, cfg: RenderConfig,
                state: PathState, key: jnp.ndarray) -> PathState:
    eps = cfg.epsilon
    R = state.origin.shape[0]
    dt = state.origin.dtype

    hit = intersect_scene(scn, meta, state.origin, state.direction, eps, cfg.t_max)
    hit_ok = hit.t < cfg.t_max
    oi = hit.obj_idx

    obj_type = scn.obj_type[oi]
    inv = scn.inverse[oi]
    inv_t = scn.inverse_transpose[oi]

    position = state.origin + state.direction * hit.t[..., None]
    eye = -state.direction
    local_point = transform_point(inv, position)

    n_local = _surface_normal(
        scn, obj_type, local_point, hit.tri_normal, hit.is_tri, oi,
        scn.min_y[oi], scn.max_y[oi], eps,
    )
    normal = normalize3(transform_vector(inv_t, n_local))
    # face-forward (tracer.cl:962-964)
    normal = jnp.where((dot3(eye, normal) < 0.0)[..., None], -normal, normal)

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
    refract_dir = jnp.where(
        outside[..., None],
        refracted_direction(eye, normal, jnp.asarray(1.0, dt), refr),
        refracted_direction(eye, normal, refr, jnp.asarray(1.0, dt)),
    )
    solid_reflect = solid & ~do_refract

    diffuse = (~do_reflect) & (~thin) & (~solid)
    hemi = random_vector_in_hemisphere(normal, u1, u2)

    reflect_dir = reflect3(state.direction, normal)
    any_reflect = do_reflect | thin_reflect | solid_reflect

    new_dir = jnp.where(any_reflect[..., None], reflect_dir,
              jnp.where(thin_pass[..., None], state.direction,
              jnp.where(do_refract[..., None], refract_dir, hemi)))
    cos = jnp.where(diffuse, dot3(hemi, normal), jnp.asarray(1.0, dt))
    new_origin = jnp.where((thin_pass | do_refract)[..., None], under, over)

    entering = do_refract & outside
    exiting = do_refract & state.inside
    new_inside = jnp.where(do_refract, outside, state.inside)
    is_refraction = entering | exiting

    color = _surface_color(scn, obj_type, oi, local_point, hit.tri_color, hit.is_tri)
    emission = jnp.where(hit.is_tri[..., None],
                         jnp.zeros(3, dtype=dt), scn.emission[oi])

    # --- fold the resolve pass forward (tracer.cl:1116-1176) ----------
    rec = state.alive & hit_ok
    no_refr = rec & ~is_refraction
    is_light = emission[..., 0] > 0.0

    accum = state.accum + jnp.where(
        no_refr[..., None], state.mask * emission, 0.0
    )
    direct = no_refr & is_light & (state.n_hits == 0)
    accum = jnp.where(direct[..., None], color, accum)
    mask = jnp.where(
        (no_refr & ~is_light)[..., None],
        state.mask * color * cos[..., None],
        state.mask,
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
        origin=jnp.where(rec[..., None], new_origin, state.origin),
        direction=jnp.where(rec[..., None], new_dir, state.direction),
        mask=mask,
        accum=accum,
        alive=alive,
        inside=jnp.where(rec, new_inside, state.inside),
        n_hits=n_hits,
        eff=eff,
    )


def render_rays(scn: SceneArrays, meta: SceneMeta, cfg: RenderConfig,
                origin: jnp.ndarray, direction: jnp.ndarray,
                key: jnp.ndarray) -> jnp.ndarray:
    """Trace a batch of primary rays to completion; returns accumulated
    radiance [R,3] (one sample each)."""
    R = origin.shape[0]
    dt = origin.dtype
    state = PathState(
        origin=origin,
        direction=direction,
        mask=jnp.ones((R, 3), dtype=dt),
        accum=jnp.zeros((R, 3), dtype=dt),
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
                key: jnp.ndarray) -> jnp.ndarray:
    """Render `n_samples` samples for each of P pixels; returns the SUM of
    sample radiances [P,3] (caller divides by total spp)."""
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
    return acc.reshape(P, S, 3).sum(axis=1)


@functools.partial(jax.jit, static_argnums=(1, 2, 5))
def _render_tile_jit(scn, meta, cfg, cam, pixel_xy, n_chunks, key):
    px = pixel_xy[:, 0]
    py = pixel_xy[:, 1]
    S = cfg.samples_per_pass

    def chunk(c, acc):
        k = jax.random.fold_in(key, c)
        s0 = (c * S).astype(jnp.int32)
        return acc + render_pass(scn, meta, cfg, cam, px, py, s0, S, k)

    init = jnp.zeros((px.shape[0], 3), dtype=cam.inverse.dtype)
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
        pixel_xy = jnp.asarray(
            np.stack([xs.ravel(), ys.ravel()], axis=-1), dtype=jnp.int32
        )
        tile = _render_tile_jit(scn, meta, cfg, cam, pixel_xy, n_chunks,
                                jax.random.fold_in(key, y0))
        out[y0:y1] = np.asarray(tile, dtype=np.float32).reshape(y1 - y0, W, 3)

    return out / float(cfg.samples)
