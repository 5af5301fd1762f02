"""Scene intersection: batched primitive tests + stackless skip-link BVH.

Behavioral equivalent of the reference's findClosestIntersection
(internal/ocl/tracer.cl:537-742):

- rays are transformed into each object's space by the cached inverse
  (tracer.cl:547-548), then tested per type: plane (tracer.cl:478), sphere
  (448), cylinder minus caps (396, caps disabled in the reference too),
  box (378), group/BVH (598-719)
- intersections strictly closer than EPSILON are discarded and anything at
  t >= 1024 counts as a miss (tracer.cl:727-739)

TPU design: all <=MAX_OBJECTS primitive tests run data-parallel as [R, No]
vector ops; the per-ray BVH walk replaces the reference's explicit int
stack[64] (tracer.cl:624) with a single skip-link index per ray inside one
lax.while_loop; each step intersects a whole LEAF_SIZE-slot leaf with
static shapes.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..scene.pack import SceneArrays, SceneMeta
from ..scene.shapes import BOX, CYLINDER, GROUP, PLANE, SPHERE
from .math3 import cross3, dot3


class Hit(NamedTuple):
    t: jnp.ndarray           # [R] distance; >= t_max means miss
    obj_idx: jnp.ndarray     # [R] i32 object slot (clipped valid; check t)
    is_tri: jnp.ndarray      # [R] bool: hit a BVH triangle
    tri_normal: jnp.ndarray  # [R,3] interpolated local normal (tri hits)
    tri_color: jnp.ndarray   # [R,3] per-triangle color (tri hits)


def _safe_div(num: jnp.ndarray, den: jnp.ndarray, use: jnp.ndarray,
              big: float) -> jnp.ndarray:
    """num/den where `use`, else num*big (reference checkAxis HUGE_VAL
    behavior, tracer.cl:250-268)."""
    den_safe = jnp.where(use, den, 1.0)
    return jnp.where(use, num / den_safe, num * big)


def slab_test(o: jnp.ndarray, d: jnp.ndarray, bb_min: jnp.ndarray,
              bb_max: jnp.ndarray, eps: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ray/AABB slab test (tracer.cl:270-280). Shapes broadcast over the
    leading dims; returns (tmin, tmax)."""
    big = 1e30
    use = jnp.abs(d) >= eps
    t1 = _safe_div(bb_min - o, d, use, big)
    t2 = _safe_div(bb_max - o, d, use, big)
    lo = jnp.minimum(t1, t2)
    hi = jnp.maximum(t1, t2)
    return jnp.max(lo, axis=-1), jnp.min(hi, axis=-1)


# ---------------------------------------------------------------------------
# Primitive tests: each takes object-space rays [R, No, 3] and returns the
# closest valid t in [eps, inf) as [R, No] (inf = miss).
# ---------------------------------------------------------------------------

def _plane_t(o, d, eps):
    dy = d[..., 1]
    ok = jnp.abs(dy) > eps
    t = -o[..., 1] / jnp.where(ok, dy, 1.0)
    return jnp.where(ok & (t > eps), t, jnp.inf)


def _sphere_t(o, d, eps):
    """Unit-sphere intersection (tracer.cl:448-476), reformulated for f32:
    the reference's b*b - 4*a*c discriminant cancels catastrophically for
    strongly anisotropic object scales (e.g. the reference scene's light
    squashed by scale(0.283, 0.01, 0.283) -> inverse scale 100x). Computing
    the perpendicular foot point geometrically is algebraically identical
    but numerically stable; verified against f64 golden renders."""
    a = dot3(d, d)
    b_half = dot3(d, o)
    t_mid = -b_half / a
    m = o + t_mid[..., None] * d          # closest point on ray to center
    perp2 = dot3(m, m)
    ok = perp2 < 1.0                       # == (disc > 0)
    dt = jnp.sqrt(jnp.where(ok, (1.0 - perp2) / a, 0.0))
    t1 = t_mid - dt
    t2 = t_mid + dt
    t1 = jnp.where(ok & (t1 > eps), t1, jnp.inf)
    t2 = jnp.where(ok & (t2 > eps), t2, jnp.inf)
    return jnp.minimum(t1, t2)


def _cylinder_t(o, d, min_y, max_y, eps):
    """Uncapped truncated cylinder (tracer.cl:396-446; caps are disabled in
    the reference kernel, tracer.cl:437-444)."""
    a = d[..., 0] ** 2 + d[..., 2] ** 2
    ok_a = jnp.abs(a) >= eps
    a_safe = jnp.where(ok_a, a, 1.0)
    # geometric (cancellation-free) quadratic, see _sphere_t
    b_half = o[..., 0] * d[..., 0] + o[..., 2] * d[..., 2]
    t_mid = -b_half / a_safe
    mx = o[..., 0] + t_mid * d[..., 0]
    mz = o[..., 2] + t_mid * d[..., 2]
    perp2 = mx * mx + mz * mz
    ok = ok_a & (perp2 <= 1.0)             # == (disc >= 0)
    dt = jnp.sqrt(jnp.where(ok, (1.0 - perp2) / a_safe, 0.0))
    t0 = t_mid - dt
    t1 = t_mid + dt
    y0 = o[..., 1] + t0 * d[..., 1]
    y1 = o[..., 1] + t1 * d[..., 1]
    v0 = ok & (y0 > min_y) & (y0 < max_y) & (t0 > eps)
    v1 = ok & (y1 > min_y) & (y1 < max_y) & (t1 > eps)
    return jnp.minimum(
        jnp.where(v0, t0, jnp.inf), jnp.where(v1, t1, jnp.inf)
    )


def _box_t(o, d, eps):
    tmin, tmax = slab_test(o, d, -1.0, 1.0, eps)
    ok = tmin <= tmax
    t_near = jnp.where(ok & (tmin > eps), tmin, jnp.inf)
    t_far = jnp.where(ok & (tmax > eps), tmax, jnp.inf)
    return jnp.minimum(t_near, t_far)


# ---------------------------------------------------------------------------
# BVH traversal
# ---------------------------------------------------------------------------

class _TravState(NamedTuple):
    idx: jnp.ndarray        # [R] current node
    best_t: jnp.ndarray     # [R]
    best_slot: jnp.ndarray  # [R] triangle slot of best hit (-1 none)
    best_u: jnp.ndarray     # [R]
    best_v: jnp.ndarray     # [R]


def traverse_bvh(
    scn: SceneArrays,
    o: jnp.ndarray,     # [R,3] object-space origin
    d: jnp.ndarray,     # [R,3] object-space direction
    root: int,
    end: int,
    leaf_size: int,
    eps: float,
    t_max: float,
) -> _TravState:
    """Stackless skip-link walk over nodes [root, end). Replaces the
    reference's per-ray explicit stack (tracer.cl:624-718)."""
    n_nodes = scn.node_bb_min.shape[0]
    R = o.shape[0]
    dt = o.dtype
    lane = jnp.arange(leaf_size, dtype=jnp.int32)[None, :]
    rr = jnp.arange(R)

    init = _TravState(
        idx=jnp.full((R,), root, dtype=jnp.int32),
        best_t=jnp.full((R,), jnp.inf, dtype=dt),
        best_slot=jnp.full((R,), -1, dtype=jnp.int32),
        best_u=jnp.zeros((R,), dtype=dt),
        best_v=jnp.zeros((R,), dtype=dt),
    )

    def cond(s: _TravState):
        return jnp.any(s.idx < end)

    def body(s: _TravState) -> _TravState:
        active = s.idx < end
        ni = jnp.clip(s.idx, 0, n_nodes - 1)
        tmin, tmax = slab_test(o, d, scn.node_bb_min[ni], scn.node_bb_max[ni], eps)
        # (tmax > eps) and (tmin < best_t) are safe prunings the reference
        # lacks (tracer.cl:270-280): a box entirely behind the ray or beyond
        # the current best hit cannot host a closer valid intersection.
        hit_box = active & (tmin < tmax) & (tmax > eps) & (tmin < s.best_t)
        is_leaf = scn.node_is_leaf[ni] == 1
        do_tri = hit_box & is_leaf

        slots = scn.node_tri_start[ni][:, None] + lane     # [R,L]
        p1 = scn.tri_p1[slots]                              # [R,L,3]
        e1 = scn.tri_e1[slots]
        e2 = scn.tri_e2[slots]

        # Möller–Trumbore (tracer.cl:640-674)
        dirx = d[:, None, :]
        dc2 = cross3(dirx, e2)
        det = dot3(e1, dc2)
        det_ok = jnp.abs(det) >= eps
        f = 1.0 / jnp.where(det_ok, det, 1.0)
        p1o = o[:, None, :] - p1
        u = f * dot3(p1o, dc2)
        oc1 = cross3(p1o, e1)
        v = f * dot3(dirx, oc1)
        t = f * dot3(e2, oc1)
        valid = (
            do_tri[:, None]
            & det_ok
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t > eps) & (t < t_max)
        )
        t_cand = jnp.where(valid, t, jnp.inf)
        j = jnp.argmin(t_cand, axis=1)
        t_leaf = t_cand[rr, j]
        better = t_leaf < s.best_t

        new = _TravState(
            idx=jnp.where(active,
                          jnp.where(hit_box, s.idx + 1, scn.node_exit[ni]),
                          s.idx),
            best_t=jnp.where(better, t_leaf, s.best_t),
            best_slot=jnp.where(better, slots[rr, j], s.best_slot),
            best_u=jnp.where(better, u[rr, j], s.best_u),
            best_v=jnp.where(better, v[rr, j], s.best_v),
        )
        return new

    return jax.lax.while_loop(cond, body, init)


# ---------------------------------------------------------------------------
# Full scene intersection
# ---------------------------------------------------------------------------

def intersect_scene(
    scn: SceneArrays,
    meta: SceneMeta,
    origin: jnp.ndarray,     # [R,3] world
    direction: jnp.ndarray,  # [R,3] world
    eps: float,
    t_max: float,
) -> Hit:
    R = origin.shape[0]
    dt = origin.dtype

    # object-space rays for every object: [R, No, 3]. Elementwise
    # multiply+reduce, NOT einsum/dot_general: default matmul precision
    # downcasts f32 operands (bf16 passes), which shifts geometry by ~1e-3
    # and causes severe self-intersection artifacts (see math3.transform_point).
    inv3 = scn.inverse[None, :, :3, :3]           # [1, No, 3, 3]
    to = (
        jnp.sum(inv3 * origin[:, None, None, :], axis=-1)
        + scn.inverse[None, :, :3, 3]
    )
    td = jnp.sum(inv3 * direction[:, None, None, :], axis=-1)

    t_plane = _plane_t(to, td, eps)
    t_sphere = _sphere_t(to, td, eps)
    t_cyl = _cylinder_t(to, td, scn.min_y[None, :], scn.max_y[None, :], eps)
    t_box = _box_t(to, td, eps)

    ot = scn.obj_type[None, :]
    t_prim = jnp.where(
        ot == PLANE, t_plane,
        jnp.where(ot == SPHERE, t_sphere,
                  jnp.where(ot == CYLINDER, t_cyl,
                            jnp.where(ot == BOX, t_box, jnp.inf))),
    )  # [R, No]

    best_obj = jnp.argmin(t_prim, axis=1).astype(jnp.int32)
    best_t = t_prim[jnp.arange(R), best_obj]

    is_tri = jnp.zeros((R,), dtype=bool)
    tri_normal = jnp.zeros((R, 3), dtype=dt)
    tri_color = jnp.zeros((R, 3), dtype=dt)
    best_slot = jnp.full((R,), -1, dtype=jnp.int32)
    best_uv = jnp.zeros((R, 2), dtype=dt)

    # BVH group objects: static unroll over the (few) group slots
    for g, root, end in meta.group_bvh:
        st = traverse_bvh(
            scn, to[:, g], td[:, g], root, end, meta.leaf_size, eps, t_max
        )
        closer = st.best_t < best_t
        best_t = jnp.where(closer, st.best_t, best_t)
        best_obj = jnp.where(closer, g, best_obj)
        is_tri = jnp.where(closer, True, is_tri)
        best_slot = jnp.where(closer, st.best_slot, best_slot)
        best_uv = jnp.where(
            closer[:, None], jnp.stack([st.best_u, st.best_v], axis=-1), best_uv
        )

    if meta.group_indices:
        slot = jnp.clip(best_slot, 0, scn.tri_p1.shape[0] - 1)
        u = best_uv[:, 0:1]
        v = best_uv[:, 1:2]
        # smooth normal interpolation n2*u + n3*v + n1*(1-u-v) (tracer.cl:669)
        tri_normal = (
            scn.tri_n2[slot] * u + scn.tri_n3[slot] * v
            + scn.tri_n1[slot] * (1.0 - u - v)
        )
        tri_color = scn.tri_color[slot]

    return Hit(
        t=jnp.minimum(best_t, t_max),
        obj_idx=best_obj,
        is_tri=is_tri,
        tri_normal=tri_normal,
        tri_color=tri_color,
    )
