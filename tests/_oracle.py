"""Independent brute-force f64 oracle path tracer.

Written directly from the REFERENCE's kernel equations
(/root/reference/internal/ocl/tracer.cl:867-1187) as an independent
implementation: no BVH (every triangle tested per ray), no SoA streams,
f64 throughout, and the reference's bounce-RECORD + resolve-pass
structure (tracer.cl:1071-1096 records, 1116-1176 resolve) instead of
the production integrator's forward-folded mask/accum. Agreement with
the production renderer is therefore evidence the ESTIMATOR matches,
not just that two copies of the same code agree.

numpy only — safe to import anywhere (no jax).
"""
from __future__ import annotations

import numpy as np

PLANE, SPHERE, CYLINDER, BOX, GROUP = 0, 1, 2, 3, 4
BIG = 1e30


def _transform_point(m, p):
    return p @ m[:3, :3].T + m[:3, 3]


def _transform_vector(m, v):
    return v @ m[:3, :3].T


def _normalize(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _plane_t(o, d, eps):
    dy = d[:, 1]
    ok = np.abs(dy) > eps
    t = -o[:, 1] / np.where(ok, dy, 1.0)
    return np.where(ok & (t > eps), t, BIG)


def _sphere_t(o, d, eps):
    # unit sphere at origin: |o + t d|^2 = 1 (tracer.cl:558-573)
    a = (d * d).sum(1)
    b = 2.0 * (o * d).sum(1)
    c = (o * o).sum(1) - 1.0
    disc = b * b - 4 * a * c
    ok = disc >= 0
    sq = np.sqrt(np.where(ok, disc, 0.0))
    t1 = (-b - sq) / (2 * a)
    t2 = (-b + sq) / (2 * a)
    t1 = np.where(ok & (t1 > eps), t1, BIG)
    t2 = np.where(ok & (t2 > eps), t2, BIG)
    return np.minimum(t1, t2)


def _cylinder_t(o, d, min_y, max_y, eps):
    a = d[:, 0] ** 2 + d[:, 2] ** 2
    ok_a = np.abs(a) >= eps
    b = 2.0 * (o[:, 0] * d[:, 0] + o[:, 2] * d[:, 2])
    c = o[:, 0] ** 2 + o[:, 2] ** 2 - 1.0
    disc = b * b - 4 * a * c
    ok = ok_a & (disc >= 0)
    sq = np.sqrt(np.where(ok, disc, 0.0))
    az = np.where(ok_a, a, 1.0)
    t1 = (-b - sq) / (2 * az)
    t2 = (-b + sq) / (2 * az)
    y1 = o[:, 1] + t1 * d[:, 1]
    y2 = o[:, 1] + t2 * d[:, 1]
    v1 = ok & (y1 > min_y) & (y1 < max_y) & (t1 > eps)
    v2 = ok & (y2 > min_y) & (y2 < max_y) & (t2 > eps)
    return np.minimum(np.where(v1, t1, BIG), np.where(v2, t2, BIG))


def _box_t(o, d, eps):
    with np.errstate(divide="ignore", invalid="ignore"):
        use = np.abs(d) >= eps
        ds = np.where(use, d, 1.0)
        t1 = np.where(use, (-1.0 - o) / ds, (-1.0 - o) * BIG)
        t2 = np.where(use, (1.0 - o) / ds, (1.0 - o) * BIG)
    tmin = np.minimum(t1, t2).max(1)
    tmax = np.maximum(t1, t2).min(1)
    ok = tmin <= tmax
    tmin = np.where(ok & (tmin > eps), tmin, BIG)
    tmax = np.where(ok & (tmax > eps), tmax, BIG)
    return np.minimum(tmin, tmax)


def _tris_t(o, d, p1, e1, e2, n1, n2, n3, tcol, eps):
    """Brute force Möller–Trumbore over ALL triangles (tracer.cl:640-674;
    no BVH by design). Returns (t, smooth normal, color)."""
    R = o.shape[0]
    bt = np.full(R, BIG)
    nrm = np.zeros((R, 3))
    col = np.zeros((R, 3))
    for i in range(p1.shape[0]):
        dc2 = np.cross(d, e2[i])
        det = dc2 @ e1[i]
        ok = np.abs(det) >= eps
        f = 1.0 / np.where(ok, det, 1.0)
        pv = o - p1[i]
        u = f * (pv * dc2).sum(1)
        oc = np.cross(pv, e1[i])
        v = f * (d * oc).sum(1)
        t = f * (oc @ e2[i])
        good = (ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
                & (t > eps) & (t < bt))
        if good.any():
            w = 1.0 - u - v
            sm = (n2[i][None] * u[:, None] + n3[i][None] * v[:, None]
                  + n1[i][None] * w[:, None])
            bt = np.where(good, t, bt)
            nrm = np.where(good[:, None], sm, nrm)
            col = np.where(good[:, None], tcol[i][None], col)
    return bt, nrm, col


class OracleScene:
    """Plain-numpy scene pulled from the packed arrays (data only — the
    tracing below re-derives all math from the reference kernel)."""

    def __init__(self, scn, meta):
        g = lambda a: np.asarray(a, np.float64)
        self.types = list(meta.obj_types)
        self.inverse = g(scn.inverse)
        self.inv_t = g(scn.inverse_transpose)
        self.color = g(scn.color)
        self.emission = g(scn.emission)
        self.refr = g(scn.refractive_index)
        self.refl = g(scn.reflectivity)
        self.min_y = g(scn.min_y)
        self.max_y = g(scn.max_y)
        # texture pipeline (data only: the u32 pool; sampling math is
        # re-derived below from tracer.cl:829/1077-1093/907-911)
        self.is_tex = np.asarray(scn.is_textured)
        self.tex_base = np.asarray(scn.tex_base, np.int64)
        self.tex_w = np.asarray(scn.tex_w, np.int64)
        self.tex_h = np.asarray(scn.tex_h, np.int64)
        self.tex_scale = g(scn.texture_scale)
        self.is_tex_nm = np.asarray(scn.is_textured_nm)
        self.tex_nm_base = np.asarray(scn.tex_nm_base, np.int64)
        self.tex_nm_w = np.asarray(scn.tex_nm_w, np.int64)
        self.tex_nm_h = np.asarray(scn.tex_nm_h, np.int64)
        self.tex_scale_nm = g(scn.texture_scale_nm)
        self.pool = np.asarray(scn.tex_pool_u32)
        self.tri_p1 = g(scn.tri_p1)
        self.tri_e1 = g(scn.tri_e1)
        self.tri_e2 = g(scn.tri_e2)
        self.tri_n1 = g(scn.tri_n1)
        self.tri_n2 = g(scn.tri_n2)
        self.tri_n3 = g(scn.tri_n3)
        self.tri_color = g(scn.tri_color)
        # owning group per triangle slot: each group's BVH occupies a
        # contiguous node range (meta.group_bvh) whose leaves cover a
        # contiguous triangle range — a multi-group scene must intersect
        # each group's triangles under THAT group's inverse transform only
        tri_group = np.full(self.tri_p1.shape[0], -1, np.int64)
        is_leaf = np.asarray(scn.node_is_leaf) > 0
        tri_start = np.asarray(scn.node_tri_start)
        for (j, root, end) in meta.group_bvh:
            starts = tri_start[root:end][is_leaf[root:end]]
            if starts.size:
                lo = int(starts.min())
                hi = int(starts.max()) + meta.leaf_size
                tri_group[lo:hi] = j
        valid = (np.abs(self.tri_e1).sum(1)
                 + np.abs(self.tri_e2).sum(1)) > 0
        self.tri_group = tri_group[valid]
        for f in ("tri_p1", "tri_e1", "tri_e2", "tri_n1", "tri_n2",
                  "tri_n3", "tri_color"):
            setattr(self, f, getattr(self, f)[valid])


def _closest_hit(sc: OracleScene, o, d, eps, t_max):
    """findClosestIntersection (tracer.cl:537-721), brute force."""
    R = o.shape[0]
    best = np.full(R, BIG)
    win = np.full(R, -1, np.int64)
    l_o = np.zeros((R, 3))
    l_d = np.zeros((R, 3))
    tri_n = np.zeros((R, 3))
    tri_c = np.zeros((R, 3))
    is_tri = np.zeros(R, bool)
    for j, code in enumerate(sc.types):
        m = sc.inverse[j]
        to = _transform_point(m, o)
        td = _transform_vector(m, d)
        trin = None
        if code == PLANE:
            t = _plane_t(to, td, eps)
        elif code == SPHERE:
            t = _sphere_t(to, td, eps)
        elif code == CYLINDER:
            t = _cylinder_t(to, td, sc.min_y[j], sc.max_y[j], eps)
        elif code == BOX:
            t = _box_t(to, td, eps)
        elif code == GROUP:
            mine = sc.tri_group == j
            if not mine.any():
                continue
            t, trin, tric = _tris_t(to, td, sc.tri_p1[mine],
                                    sc.tri_e1[mine], sc.tri_e2[mine],
                                    sc.tri_n1[mine], sc.tri_n2[mine],
                                    sc.tri_n3[mine], sc.tri_color[mine],
                                    eps)
        else:
            continue
        closer = t < best
        best = np.where(closer, t, best)
        win = np.where(closer, j, win)
        l_o = np.where(closer[:, None], to, l_o)
        l_d = np.where(closer[:, None], td, l_d)
        if trin is None:
            is_tri = np.where(closer, False, is_tri)
        else:
            is_tri = np.where(closer, True, is_tri)
            tri_n = np.where(closer[:, None], trin, tri_n)
            tri_c = np.where(closer[:, None], tric, tri_c)
    hit = best < t_max
    return best, win, l_o, l_d, is_tri, tri_n, tri_c, hit


def _surface_normal(sc, win, lp, is_tri, tri_n, eps):
    """Normal by type (tracer.cl:903-950) in object space, incl. plane
    normal maps (tracer.cl:907-911: the normalized texel IS the normal;
    uv = |local| * scale)."""
    R = lp.shape[0]
    n = np.zeros((R, 3))
    for j, code in enumerate(sc.types):
        sel = (win == j) & ~is_tri
        if not sel.any():
            continue
        p = lp[sel]
        if code == PLANE:
            nj = np.tile([0.0, 1.0, 0.0], (sel.sum(), 1))
            if sc.is_tex_nm[j]:
                u = np.abs(p[:, 0]) * sc.tex_scale_nm[j, 0]
                v = np.abs(p[:, 2]) * sc.tex_scale_nm[j, 1]
                nj = _normalize(_sample_pool(
                    sc.pool, sc.tex_nm_base[j], sc.tex_nm_w[j],
                    sc.tex_nm_h[j], u, v))
        elif code == SPHERE:
            nj = p.copy()
        elif code == CYLINDER:
            dist = p[:, 0] ** 2 + p[:, 2] ** 2
            top = (dist < 1) & (p[:, 1] >= sc.max_y[j] - eps)
            bot = (dist < 1) & (p[:, 1] <= sc.min_y[j] + eps)
            nj = np.stack([p[:, 0], np.zeros(len(p)), p[:, 2]], 1)
            nj[top] = [0, 1, 0]
            nj[bot] = [0, -1, 0]
        elif code == BOX:
            a = np.abs(p)
            nj = np.zeros_like(p)
            axis = a.argmax(1)
            nj[np.arange(len(p)), axis] = p[np.arange(len(p)), axis]
        else:
            nj = np.zeros((sel.sum(), 3))
        n[sel] = nj
    n = np.where(is_tri[:, None], tri_n, n)
    return n


def _sample_pool(pool, base, w, h, u, v):
    """OpenCL image sampler semantics (tracer.cl:829): normalized
    coordinates, REPEAT wrap, LINEAR filtering with texel centers at
    (i + 0.5)/W — bilinear over the rgb8-in-u32 flat pool, f64 weights."""
    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = np.floor(fx)
    y0 = np.floor(fy)
    tx = (fx - x0)[:, None]
    ty = (fy - y0)[:, None]
    x0i = np.mod(x0.astype(np.int64), w)
    x1i = np.mod(x0i + 1, w)
    y0i = np.mod(y0.astype(np.int64), h)
    y1i = np.mod(y0i + 1, h)

    def texel(yi, xi):
        p = pool[base + yi * w + xi]
        return np.stack([p & 0xFF, (p >> 8) & 0xFF, (p >> 16) & 0xFF],
                        axis=-1).astype(np.float64) / 255.0

    top = texel(y0i, x0i) * (1 - tx) + texel(y0i, x1i) * tx
    bot = texel(y1i, x0i) * (1 - tx) + texel(y1i, x1i) * tx
    return top * (1 - ty) + bot * ty


def _spherical_uv(p):
    """sphereUV (tracer.cl:178-213) + the kernel's v flip at the call
    site (tracer.cl:1085): returns the texture-space coordinates."""
    theta = np.arctan2(p[:, 0], p[:, 2])
    radius = np.sqrt((p * p).sum(1))
    phi = np.arccos(np.clip(p[:, 1] / radius, -1.0, 1.0))
    raw_u = theta / (2.0 * np.pi)
    u = 1.0 - (raw_u + 0.5)
    return u, phi / np.pi


def _cube_uv(p):
    """cubeUV cross layout (tracer.cl:113-175): face from the dominant
    |coord|, per-face u/v from C-fmod folds."""
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    fmod = lambda a, b: a - b * np.trunc(a / b)
    coord = np.abs(p).max(axis=1)
    third = 0.333333
    v_mid = 0.6666666 - (fmod(y + 1.0, 2.0) / 2.0) * third
    u = np.where(coord == x, 0.5 + (fmod(1.0 - z, 2.0) / 2.0) * 0.25,
        np.where(coord == -x, (fmod(z + 1.0, 2.0) / 2.0) * 0.25,
                 0.25 + (fmod(x + 1.0, 2.0) / 2.0) * 0.25))
    u = np.where((coord != x) & (coord != -x) & (coord != y)
                 & (coord != -y) & (coord != z),
                 0.75 + (fmod(1.0 - x, 2.0) / 2.0) * 0.25, u)
    v = np.where((coord == x) | (coord == -x), v_mid,
        np.where(coord == y, 1.0 - (fmod(1.0 - z, 2.0) / 2.0) * third,
        np.where(coord == -y, (fmod(z + 1.0, 2.0) / 2.0) * third, v_mid)))
    return u, v


def _textured_color(sc, win, lp, color):
    """Texture overrides (tracer.cl:1077-1093): plane uses scaled local
    x/z, sphere the spherical map (v flipped), box the cube cross."""
    for j, code in enumerate(sc.types):
        if not sc.is_tex[j] or code not in (PLANE, SPHERE, BOX):
            continue
        sel = win == j
        if not sel.any():
            continue
        p = lp[sel]
        if code == PLANE:
            u = p[:, 0] * sc.tex_scale[j, 0]
            v = p[:, 2] * sc.tex_scale[j, 1]
        elif code == SPHERE:
            u, v = _spherical_uv(p)
        else:
            u, v = _cube_uv(p)
        color[sel] = _sample_pool(sc.pool, sc.tex_base[j], sc.tex_w[j],
                                  sc.tex_h[j], u, v)
    return color


def _schlick(eye, n, n1, n2):
    """tracer.cl:485-505."""
    cos = (eye * n).sum(1)
    r = n1 / n2
    sin2t = r * r * (1.0 - cos * cos)
    tir = (n1 > n2) & (sin2t > 1.0)
    cos_t = np.sqrt(np.clip(1.0 - sin2t, 0, None))
    cos_eff = np.where(n1 > n2, cos_t, cos)
    tmp = (n1 - n2) / (n1 + n2)
    r0 = tmp * tmp
    m = 1.0 - cos_eff
    res = r0 + (1 - r0) * m ** 5
    return np.where(tir, 1.0, res)


def _refract(eye, n, n1, n2):
    cos_i = (eye * n).sum(1)
    r = (n1 / n2)
    sin2t = r * r * (1.0 - cos_i * cos_i)
    cos_t = np.sqrt(np.clip(1.0 - sin2t, 0, None))
    k = (r * cos_i - cos_t)[:, None]
    out = n * k - eye * r[:, None]
    return np.where((sin2t <= 1.0)[:, None], out, 0.0)


def _hemisphere(n, u1, u2):
    """randomVectorInHemisphere (tracer.cl:348-366)."""
    rand1 = 2 * np.pi * u1
    rand2s = np.sqrt(u2)
    w = n
    pick = np.abs(w[:, 0]) > 0.1
    axis = np.where(pick[:, None], np.array([[0.0, 1.0, 0.0]]),
                    np.array([[1.0, 0.0, 0.0]]))
    u = _normalize(np.cross(axis, w))
    v = np.cross(w, u)
    return (u * (np.cos(rand1) * rand2s)[:, None]
            + v * (np.sin(rand1) * rand2s)[:, None]
            + w * np.sqrt(1.0 - u2)[:, None])


def oracle_render(scn, meta, camera, width, height, spp, seed,
                  max_bounces=10, max_eff=4, eps=1e-4, t_max=1e6):
    """Render [H, W, 3] f64 with the bounce-record + resolve structure of
    the reference kernel (tracer.cl:867-1187)."""
    sc = OracleScene(scn, meta)
    rng = np.random.default_rng(seed)

    ys, xs = np.mgrid[0:height, 0:width]
    xs = np.repeat(xs.ravel(), spp).astype(np.float64)
    ys = np.repeat(ys.ravel(), spp).astype(np.float64)
    R = xs.shape[0]

    inv_cam = np.asarray(camera.inverse, np.float64)
    ps = float(camera.pixel_size)
    hw, hh = float(camera.half_width), float(camera.half_height)
    jx = rng.random(R)
    jy = rng.random(R)
    wx = hw - (xs + jx) * ps
    wy = hh - (ys + jy) * ps
    pix = np.stack([wx, wy, -np.ones(R)], 1)
    pw = _transform_point(inv_cam, pix)
    ow = np.tile(inv_cam[:3, 3], (R, 1))
    d = _normalize(pw - ow)
    o = ow

    inside = np.zeros(R, bool)
    alive = np.ones(R, bool)
    eff = np.zeros(R, np.int64)
    records = []

    for _ in range(max_bounces):
        if not alive.any():
            break
        t, win, l_o, l_d, is_tri, tri_n, tri_c, hit = _closest_hit(
            sc, o, d, eps, t_max)
        t = np.minimum(t, t_max)
        lp = l_o + l_d * t[:, None]
        n_loc = _surface_normal(sc, win, lp, is_tri, tri_n, eps)
        winc = np.clip(win, 0, len(sc.types) - 1)
        n_world = np.einsum("rij,rj->ri",
                            sc.inv_t[winc][:, :3, :3], n_loc)
        n_world = _normalize(n_world)
        eye = -d
        flipped = (eye * n_world).sum(1) < 0
        n_world = np.where(flipped[:, None], -n_world, n_world)

        u = rng.random((4, R))
        refl = sc.refl[winc]
        refr = sc.refr[winc]
        color = np.where(is_tri[:, None], tri_c, sc.color[winc])
        color = _textured_color(sc, np.where(is_tri, -1, win), lp, color)
        emission = np.where(is_tri[:, None], 0.0, sc.emission[winc])

        do_reflect = (refl != 0) & (u[0] < refl)
        thin = ~do_reflect & (refr == -1.0)
        sch_thin = _schlick(eye, n_world, 1.0, 1.5)
        thin_pass = thin & (sch_thin < u[1])
        thin_refl = thin & ~(sch_thin < u[1])
        solid = ~do_reflect & ~thin & (refr != 1.0)
        sch = np.where(~inside,
                       _schlick(eye, n_world, 1.0, refr),
                       _schlick(eye, n_world, refr, 1.0))
        do_refract = solid & (sch < u[1])
        refr_dir = np.where(
            ~inside[:, None],
            _refract(eye, n_world, np.full(R, 1.0), refr),
            _refract(eye, n_world, refr, np.full(R, 1.0)))
        solid_refl = solid & ~do_refract
        diffuse = ~do_reflect & ~thin & ~solid
        hemi = _hemisphere(n_world, u[2], u[3])

        reflect_dir = d - n_world * (2 * (d * n_world).sum(1))[:, None]
        any_reflect = do_reflect | thin_refl | solid_refl
        nd = np.where(any_reflect[:, None], reflect_dir,
             np.where(thin_pass[:, None], d,
             np.where(do_refract[:, None], refr_dir, hemi)))
        cos = np.where(diffuse, (hemi * n_world).sum(1), 1.0)
        pos = o + d * t[:, None]
        over = pos + n_world * eps
        under = pos - n_world * eps
        no = np.where((thin_pass | do_refract)[:, None], under, over)

        is_refraction = do_refract.copy()
        rec = alive & hit
        records.append({
            "rec": rec, "is_refr": is_refraction & rec,
            "color": color, "emission": emission, "cos": cos,
        })

        eff = eff + (rec & ~is_refraction & ~any_reflect)
        is_light = emission[:, 0] > 0
        alive = alive & hit & ~(rec & is_light) & (eff < max_eff)
        o = np.where(rec[:, None], no, o)
        d = np.where(rec[:, None], nd, d)
        inside = np.where(rec & do_refract, ~inside, inside)

    # resolve pass over the records (tracer.cl:1116-1176 structure)
    accum = np.zeros((R, 3))
    mask = np.ones((R, 3))
    hits_before = np.zeros(R, np.int64)
    for r in records:
        m = r["rec"] & ~r["is_refr"]
        is_light = r["emission"][:, 0] > 0
        accum = accum + np.where(m[:, None], mask * r["emission"], 0.0)
        direct = m & is_light & (hits_before == 0)
        accum = np.where(direct[:, None], r["color"], accum)
        upd = m & ~is_light
        mask = np.where(upd[:, None],
                        mask * r["color"] * r["cos"][:, None], mask)
        hits_before = hits_before + r["rec"]

    img = accum.reshape(height * width, spp, 3).mean(axis=1)
    return img.reshape(height, width, 3)
