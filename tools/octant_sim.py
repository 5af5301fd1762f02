"""Simulate octant-ordered (front-to-back) packet traversal vs the fixed
DFS skip-link order, on the production snapped-SAH tree.

The packet walk pays the UNION of its rays' node/leaf visits
(render/pallas_kernel.py:_packet_traverse). Visiting children NEAR-first
(by the packet's majority direction octant) shrinks best-t earlier, which
prunes far leaves for every ray that already found a hit. This script
measures exactly that: node iterations + leaf visits for primary packets
and for derived diffuse bounce packets, fixed order vs octant order, and
scanline vs block pixel tiles.

Usage: python tools/octant_sim.py [scene ...]
"""
import os
import sys

import numpy as np

sys.path.insert(0, ".")
# This is a CPU-only simulator: hard-pin the platform. The axon TPU
# plugin pre-sets JAX_PLATFORMS=axon at interpreter start (so setdefault
# would keep it) and re-reads it lazily — both the env var AND
# jax.config must be forced BEFORE any backend init, or the tool
# silently attaches the TPU tunnel (tests/conftest.py, same workaround).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.scene.bvh import _build_tree
from pathtracer_tpu.scene.pack import pack_scene
from pathtracer_tpu.scene.shapes import GROUP
from pathtracer_tpu.scenes import get_scene


def tri_test(p1s, e1s, e2s, sl, o, d, bt, hit, eps=1e-4):
    e1 = e1s[sl][:, None, :]
    e2 = e2s[sl][:, None, :]
    p1 = p1s[sl][:, None, :]
    dn = d[None, :, :]
    dc2 = np.cross(dn, e2)
    det = (e1 * dc2).sum(axis=2)
    ok = np.abs(det) >= eps
    f = 1.0 / np.where(ok, det, 1.0)
    pv = o[None, :, :] - p1
    u = f * (pv * dc2).sum(axis=2)
    oc = np.cross(pv, e1)
    v = f * (dn * oc).sum(axis=2)
    t = f * (e2 * oc).sum(axis=2)
    good = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > eps)
    t = np.where(good, t, 1e30).min(axis=0)
    better = hit & (t < bt)
    return np.where(better, t, bt), better


def trace(node, tris, o, d, octant_order, eps=1e-4):
    """Recursive packet walk over the _Node tree. Returns
    (iters, leaf_visits, bt, hit_pos)."""
    p1s, e1s, e2s = tris
    R = o.shape[0]
    ad = np.abs(d)
    inv = np.where(ad >= eps, 1.0 / np.where(ad >= eps, d, 1), 1e30)
    bt = np.full(R, 1e30)
    hit_pos = np.zeros((R, 3))
    stats = [0, 0]

    # majority direction sign per axis over the packet
    neg = (d < 0).sum(axis=0) * 2 > R  # [3] bool: majority negative

    def visit(n):
        t1 = (n.bb_min - 1e-4 - o) * inv
        t2 = (n.bb_max + 1e-4 - o) * inv
        tmin = np.minimum(t1, t2).max(axis=1)
        tmax = np.maximum(t1, t2).min(axis=1)
        hit = (tmin <= tmax) & (tmax > eps) & (tmin < bt)
        stats[0] += 1
        if not hit.any():
            return
        if n.tri_ids is not None:
            stats[1] += 1
            sl = n.tri_ids
            nonlocal_bt, better = tri_test(p1s, e1s, e2s, sl, o, d, bt, hit)
            bt[:] = nonlocal_bt
            hit_pos[better] = o[better] + d[better] * bt[better, None]
            return
        a, b = n.left, n.right
        if octant_order:
            ca = (a.bb_min + a.bb_max) / 2
            cb = (b.bb_min + b.bb_max) / 2
            axis = int(np.argmax(np.abs(cb - ca)))
            # near child first given the packet's majority sign
            if (cb[axis] < ca[axis]) != neg[axis]:
                a, b = b, a
        visit(a)
        visit(b)

    visit(node)
    return stats[0], stats[1], bt, hit_pos


def main(scene_name, leaf_sizes=(16, 32)):
    cfg = RenderConfig(width=1280, height=960, samples=1)
    sc = get_scene(scene_name, cfg)
    scn, meta = pack_scene(sc.objects)
    if not meta.has_groups:
        print(f"{scene_name}: no mesh")
        return
    p1 = np.asarray(scn.tri_p1, np.float64)
    e1 = np.asarray(scn.tri_e1, np.float64)
    e2 = np.asarray(scn.tri_e2, np.float64)
    valid = (np.abs(e1).sum(1) + np.abs(e2).sum(1)) > 0
    p1v, e1v, e2v = p1[valid], e1[valid], e2[valid]
    p2v, p3v = p1v + e1v, p1v + e2v
    tb_min = np.minimum(np.minimum(p1v, p2v), p3v)
    tb_max = np.maximum(np.maximum(p1v, p2v), p3v)
    centr = (p1v + p2v + p3v) / 3.0
    tris = (p1v, e1v, e2v)

    cam = sc.camera
    inv_cam = np.asarray(cam.inverse, np.float64)
    gidx = [j for j, t in enumerate(meta.obj_types) if t == GROUP][0]
    inv_obj = np.asarray(scn.inverse, np.float64)[gidx]
    W, H, TILE = 1280, 960, 4096

    def rays_for(pids):
        xs = pids % W
        ys = pids // W
        ps = float(cam.pixel_size)
        wx = float(cam.half_width) - (xs + 0.5) * ps
        wy = float(cam.half_height) - (ys + 0.5) * ps
        pix = np.stack([wx, wy, -np.ones_like(wx), np.ones_like(wx)], 1)
        pw = pix @ inv_cam.T
        ow = (np.array([0, 0, 0, 1.0]) @ inv_cam.T)[None, :].repeat(
            len(pw), 0)
        dirw = pw[:, :3] - ow[:, :3]
        dirw /= np.linalg.norm(dirw, axis=1, keepdims=True)
        o_loc = (np.concatenate([ow[:, :3], np.ones((len(ow), 1))], 1)
                 @ inv_obj.T)[:, :3]
        d_loc = (np.concatenate([dirw, np.zeros((len(ow), 1))], 1)
                 @ inv_obj.T)[:, :3]
        return o_loc, d_loc

    def packets(order):
        ids = np.arange(W * H)
        if order == "block":
            k = ids
            b = k // TILE
            i = k % TILE
            nbx = W // 64
            x = (b % nbx) * 64 + i % 64
            y = (b // nbx) * 64 + i // 64
            ids = y * W + x
        return ids.reshape(-1, TILE)

    rng = np.random.default_rng(0)
    print(f"=== {scene_name} ({valid.sum()} tris) ===")
    for leaf_size in leaf_sizes:
        root = _build_tree(tb_min, tb_max, centr,
                           np.arange(len(p1v)), leaf_size)
        for order in ("linear", "block"):
            packs = packets(order)
            sel = rng.choice(len(packs), size=min(16, len(packs)),
                             replace=False)
            for octant in (False, True):
                pit = plf = bit = blf = nb = 0
                for pk in sel:
                    o, d = rays_for(packs[pk])
                    it, lf, bt, hp = trace(root, tris, o, d, octant)
                    pit += it
                    plf += lf
                    hmask = bt < 1e29
                    if hmask.sum() > 64:
                        o2 = hp[hmask]
                        d2 = rng.normal(size=o2.shape)
                        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
                        it2, lf2, _, _ = trace(root, tris, o2, d2, octant)
                        bit += it2
                        blf += lf2
                        nb += 1
                tag = "octant" if octant else "fixed "
                print(f"  leaf={leaf_size:3d} {order:6s} {tag} "
                      f"| primary it={pit:6d} lf={plf:5d} "
                      f"| bounce({nb:2d}) it={bit:6d} lf={blf:5d}",
                      flush=True)


if __name__ == "__main__":
    for name in sys.argv[1:] or ["teapot", "gopher"]:
        main(name)
