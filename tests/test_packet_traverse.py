"""Direct interpret-mode validation of the packet BVH walk.

`_packet_traverse` (render/pallas_kernel.py) is the one routine shared by
the megakernel, the intersect-only kernel, and the differentiable kernel,
and it contains the round-2 dual-basis triangle test + sub-packet leaf
gating. The render-level parity tests are TPU-gated (on-core PRNG), but
the traversal itself is PRNG-free, so this file drives it directly in an
interpret-mode pallas_call on the CPU and checks every ray against a
brute-force numpy Möller–Trumbore oracle (reference equations,
/root/reference/internal/ocl/tracer.cl:640-674).

Covers both lane layouts: (8, 128) -> single chunk (nc=1) and (8, 512)
-> four 128-lane sub-packets (nc=4), and the uniform-color broadcast
elision (teapot packs to a single-material pool).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render import pallas_kernel as pk
from pathtracer_tpu.scenes import get_scene


@functools.lru_cache(maxsize=1)
def _teapot():
    cfg = RenderConfig(width=16, height=12, samples=1, samples_per_pass=1)
    sc = get_scene("teapot", cfg)
    arrays, meta = sc.pack()
    return cfg, arrays, meta


def _traverse_interpret(meta, cfg, nodes, tris, rays, tile,
                        uniform_color=None, return_slot=False):
    """One interpret-mode pallas_call around _packet_traverse."""
    S, L = tile
    leaf_rows = meta.leaf_size // pk._TRI_SLOTS_PER_ROW
    # walk copy 0 (original DFS order) of the single group's BVH
    (_, root, end), = meta.group_bvh
    n_out = 8 if return_slot else 7

    def kernel(node_ref, tri_ref, ox, oy, oz, dx, dy, dz, *outs):
        bt0 = jnp.full((S, L), pk._BIG, jnp.float32)
        act = jnp.ones((S, L), jnp.bool_)
        res = pk._packet_traverse(
            node_ref, tri_ref, leaf_rows, cfg.epsilon, cfg.t_max,
            root, end, ox[...], oy[...], oz[...],
            dx[...], dy[...], dz[...], act, bt0,
            uniform_color=uniform_color, return_slot=return_slot)
        for ref, val in zip(outs, res):
            ref[...] = val

    f32 = jax.ShapeDtypeStruct((S, L), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out,
        out_shape=[f32] * n_out,
        interpret=True,
    )(jnp.asarray(nodes), jnp.asarray(tris), *rays)
    return [np.asarray(o) for o in outs]


def _brute_force(arrays, eps, o, d):
    """Closest-hit oracle: Möller–Trumbore over every real triangle."""
    p1 = np.asarray(arrays.tri_p1, np.float32)
    e1 = np.asarray(arrays.tri_e1, np.float32)
    e2 = np.asarray(arrays.tri_e2, np.float32)
    best_t = np.full(o.shape[0], pk._BIG, np.float32)
    best_i = np.full(o.shape[0], -1, np.int64)
    for i in range(p1.shape[0]):
        dxe2 = np.cross(d, e2[i])
        det = dxe2 @ e1[i]
        ok = np.abs(det) >= eps
        f = 1.0 / np.where(ok, det, 1.0)
        p = o - p1[i]
        u = f * (p * dxe2).sum(1)
        q = np.cross(p, e1[i])
        v = f * (q * d).sum(1)
        t = f * (q @ e2[i])
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > eps) \
            & (t < best_t)
        best_t = np.where(hit, t, best_t)
        best_i = np.where(hit, i, best_i)
    return best_t, best_i


def _rays_toward_mesh(arrays, n, seed=0):
    """Random rays aimed into the mesh bounding box (plus some misses)."""
    rng = np.random.default_rng(seed)
    lo = np.asarray(arrays.node_bb_min).min(axis=0)
    hi = np.asarray(arrays.node_bb_max).max(axis=0)
    center = (lo + hi) / 2
    span = (hi - lo).max()
    o = center + rng.normal(size=(n, 3)) * span * 1.5
    tgt = lo + rng.random((n, 3)) * (hi - lo)
    # last quarter aims away from the box: guaranteed misses
    miss = np.arange(n) >= (3 * n) // 4
    d = np.where(miss[:, None], o - center, tgt - o)
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


@pytest.mark.parametrize("tile", [(8, 128), (8, 512)])
def test_packet_traverse_matches_brute_force(tile):
    cfg, arrays, meta = _teapot()
    S, L = tile
    n = S * L
    o, d = _rays_toward_mesh(arrays, n, seed=tile[1])
    nodes, tris = pk.build_mesh_tables(arrays, meta)

    rays = [jnp.asarray(x.reshape(S, L)) for x in
            (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])]
    t, nx, ny, nz, cr, cg, cb = _traverse_interpret(
        meta, cfg, nodes, tris, rays, tile,
        uniform_color=meta.tri_uniform_color)
    t = t.reshape(-1)

    bt, bi = _brute_force(arrays, cfg.epsilon, o, d)
    hit = bi >= 0

    # same hit/miss classification and same closest t
    assert np.array_equal(t < pk._BIG, hit)
    np.testing.assert_allclose(t[hit], bt[hit], rtol=2e-4, atol=2e-5)
    assert hit.sum() > n // 4          # the aimed rays actually hit

    # interpolated smooth normals are unit-ish and colors match the pool
    nrm = np.stack([nx.reshape(-1), ny.reshape(-1),
                    nz.reshape(-1)], 1)[hit]
    ln = np.linalg.norm(nrm, axis=1)
    assert (np.abs(ln - 1.0) < 0.1).mean() > 0.99
    cols = np.stack([cr.reshape(-1), cg.reshape(-1),
                     cb.reshape(-1)], 1)[hit]
    pool_cols = np.asarray(arrays.tri_color, np.float32)[bi[hit]]
    np.testing.assert_allclose(cols, pool_cols, atol=1e-6)


def test_packet_traverse_slot_tracking():
    """return_slot reports the winning global triangle slot: validated
    against the brute-force oracle's argmin index (ties — rays whose
    two closest triangles are ULP-level equal — are accepted when the
    reported slot's own Möller–Trumbore t equals the oracle's best t).
    The tri-grad tape (pallas_grad tri_grads) keys on this value."""
    cfg, arrays, meta = _teapot()
    S, L = 8, 512
    o, d = _rays_toward_mesh(arrays, S * L, seed=5)
    nodes, tris = pk.build_mesh_tables(arrays, meta)
    rays = [jnp.asarray(x.reshape(S, L)) for x in
            (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])]
    # per-slot colors read (uniform elision off), slot tracked — the
    # exact configuration the differentiable kernel runs
    t, nx, ny, nz, cr, cg, cb, sl = _traverse_interpret(
        meta, cfg, nodes, tris, rays, (S, L),
        uniform_color=None, return_slot=True)
    t = t.reshape(-1)
    sl = sl.reshape(-1).astype(np.int64)

    bt, bi = _brute_force(arrays, cfg.epsilon, o, d)
    hit = bi >= 0
    assert np.array_equal(sl >= 0, hit)
    exact = sl[hit] == bi[hit]
    assert exact.mean() > 0.95

    # non-exact slots must still be genuine closest hits (ties): the
    # reported slot's own triangle yields the oracle's best t
    if (~exact).any():
        p1 = np.asarray(arrays.tri_p1, np.float32)
        e1 = np.asarray(arrays.tri_e1, np.float32)
        e2 = np.asarray(arrays.tri_e2, np.float32)
        idx = np.flatnonzero(hit)[~exact]
        for i in idx:
            s = sl[i]
            dxe2 = np.cross(d[i], e2[s])
            det = dxe2 @ e1[s]
            q = np.cross(o[i] - p1[s], e1[s])
            t_s = (q @ e2[s]) / det
            assert abs(t_s - bt[i]) <= 2e-4 * max(abs(bt[i]), 1.0), (
                i, s, bi[i], t_s, bt[i])


def test_uniform_color_detection():
    """teapot is single-material -> static color elision kicks in; the
    mixed-color `default` group scene must keep per-tri colors."""
    _, _, meta = _teapot()
    assert meta.tri_uniform_color is not None
    cfg = RenderConfig(width=16, height=12, samples=1, samples_per_pass=1)
    sc = get_scene("default", cfg)
    _, m2 = sc.pack()
    # whichever way `default` packs, the field must be consistent with
    # the REAL (non-padding) pool colors; padding slots are degenerate
    # and never hit, so they don't constrain uniformity
    a2 = sc.pack()[0]
    ng = np.cross(np.asarray(a2.tri_e1), np.asarray(a2.tri_e2))
    cols = np.asarray(a2.tri_color)[(ng * ng).sum(1) > 0]
    uniform = bool((cols == cols[0]).all())
    assert (m2.tri_uniform_color is not None) == uniform
    if uniform:
        assert m2.tri_uniform_color == tuple(float(c) for c in cols[0])


def test_octant_copy_parity():
    """Every octant node order must produce the same hits as copy 0
    (front-to-back reordering changes visit order, not the result)."""
    cfg, arrays, meta = _teapot()
    if not meta.octant_orders:
        pytest.skip("no octant copies packed")
    S, L = 8, 128
    o, d = _rays_toward_mesh(arrays, S * L, seed=9)
    nodes, tris = pk.build_mesh_tables(arrays, meta)
    rays = [jnp.asarray(x.reshape(S, L)) for x in
            (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])]

    leaf_rows = meta.leaf_size // pk._TRI_SLOTS_PER_ROW
    (_, root, end), = meta.group_bvh

    def run(base):
        def kernel(node_ref, tri_ref, ox, oy, oz, dx, dy, dz, t_out):
            bt0 = jnp.full((S, L), pk._BIG, jnp.float32)
            act = jnp.ones((S, L), jnp.bool_)
            t, *_ = pk._packet_traverse(
                node_ref, tri_ref, leaf_rows, cfg.epsilon, cfg.t_max,
                root, end, ox[...], oy[...], oz[...],
                dx[...], dy[...], dz[...], act, bt0,
                oct_base=None if base is None else jnp.int32(base),
                uniform_color=meta.tri_uniform_color)
            t_out[...] = t

        return np.asarray(pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
            interpret=True,
        )(jnp.asarray(nodes), jnp.asarray(tris), *rays))

    t0 = run(None)
    for oc in range(8):
        toc = run((1 + oc) * meta.n_nodes)
        np.testing.assert_allclose(toc, t0, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("scene,leaf", [
    ("teapot", None),    # default K=32
    ("gopher", None),    # default K=16 (8 payload leaves per lane-block)
    ("teapot", 64),      # K > 32: multiple MXU row-tiles per leaf
    ("teapot", 128),     # K = 128: one payload leaf per lane-block
])
def test_mxu_traverse_matches_brute_force(scene, leaf):
    """The MXU leaf machine (_packet_traverse_mxu + build_mxu_tri_table)
    must return the same closest hits as the brute-force oracle — same
    dual-basis test expressed as matmuls. Covers the default leaf sizes
    and the large-leaf configurations the hardware sweep A/Bs (the
    lane-packed table supports any K <= 128)."""
    cfg = RenderConfig(width=16, height=12, samples=1, samples_per_pass=1)
    sc = get_scene(scene, cfg)
    if leaf is None:
        arrays, meta = sc.pack()
    else:
        from pathtracer_tpu.scene.pack import pack_scene

        arrays, meta = pack_scene(sc.objects, leaf_size=leaf)
    S, L = 8, 256
    n = S * L
    o, d = _rays_toward_mesh(arrays, n, seed=5)
    nodes, _ = pk.build_mesh_tables(arrays, meta)
    mxu = pk.build_mxu_tri_table(arrays, meta)
    (_, root, end), = meta.group_bvh
    K, ns = meta.leaf_size, meta.n_tri_slots

    def kernel(node_ref, tri_ref, ox, oy, oz, dx, dy, dz,
               t_out, nx_out, ny_out, nz_out, cr_out, cg_out, cb_out):
        bt0 = jnp.full((S, L), pk._BIG, jnp.float32)
        act = jnp.ones((S, L), jnp.bool_)
        t, nx, ny, nz, cr, cg, cb = pk._packet_traverse_mxu(
            node_ref, tri_ref, K, ns, cfg.epsilon, cfg.t_max,
            root, end, ox[...], oy[...], oz[...],
            dx[...], dy[...], dz[...], act, bt0)
        t_out[...] = t
        nx_out[...] = nx
        ny_out[...] = ny
        nz_out[...] = nz
        cr_out[...] = cr
        cg_out[...] = cg
        cb_out[...] = cb

    rays = [jnp.asarray(x.reshape(S, L)) for x in
            (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])]
    f32 = jax.ShapeDtypeStruct((S, L), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_shape=[f32] * 7,
        interpret=True,
    )(jnp.asarray(nodes), jnp.asarray(mxu), *rays)
    t, nx, ny, nz, cr, cg, cb = [np.asarray(x) for x in outs]
    t = t.reshape(-1)

    bt, bi = _brute_force(arrays, cfg.epsilon, o, d)
    hit = bi >= 0
    assert np.array_equal(t < pk._BIG, hit)
    np.testing.assert_allclose(t[hit], bt[hit], rtol=2e-4, atol=2e-5)
    assert hit.sum() > n // 4

    nrm = np.stack([nx.reshape(-1), ny.reshape(-1),
                    nz.reshape(-1)], 1)[hit]
    ln = np.linalg.norm(nrm, axis=1)
    assert (np.abs(ln - 1.0) < 0.1).mean() > 0.99
    cols = np.stack([cr.reshape(-1), cg.reshape(-1),
                     cb.reshape(-1)], 1)[hit]
    pool_cols = np.asarray(arrays.tri_color, np.float32)[bi[hit]]
    # exact-tie rays average payload; allow the rare mismatch
    match = np.isclose(cols, pool_cols, atol=1e-5).all(axis=1)
    assert match.mean() > 0.999


def test_mxu_table_numpy_jnp_parity():
    """The numpy (host, multi-process path) and jnp (on-device) MXU
    table builders must agree — same guarantee the classic tables give
    (build_mesh_tables vs scene_tables_jnp)."""
    cfg = RenderConfig(width=16, height=12, samples=1, samples_per_pass=1)
    sc = get_scene("gopher", cfg)
    arrays, meta = sc.pack()
    t_np = pk.build_mxu_tri_table(arrays, meta)
    _, _, t_jnp = pk.scene_tables_jnp(arrays, meta, traversal="mxu")
    assert t_np.shape == t_jnp.shape
    # not bit-exact: XLA contracts the cross products / divisions with
    # FMAs where numpy rounds each op (0.05% of elements differ by
    # <=1.3e-4). Every process in a run uses ONE builder, so this only
    # needs closeness, not equality.
    np.testing.assert_allclose(np.asarray(t_jnp), t_np,
                               rtol=2e-2, atol=2e-4)
