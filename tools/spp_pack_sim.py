"""Predict the sample-in-rows packing win (round 3).

The round-3 hardware ablations pinned mesh-scene cost almost entirely
on LEAF vector work (node-walk-only ablation: 260 Ms/s vs 2.6 full),
with sub-packet gating a net loss — so with monolithic (8,512) tiles,
cost ~= total leaf visits x K x tile. The remaining lever is shrinking
each packet's UNION of leaf visits without shrinking the packet: pack
s samples of the SAME pixel block into the tile's lanes (rows =
samples), so a 4096-lane packet covers 4096/s pixels. Primary waves
then share ~identical rays s-fold (union ~= that of the smaller pixel
block), and bounce waves bounce from s-fold-clustered origins (origin
locality is what packet unions care about — tools/sort_sim.py).

This replays EXACT packet traversal of the production packed BVH over
equal screen regions and equal total rays for several (pixels_per_tile,
samples) splits, and reports total leaf visits + node iters per config,
normalized to the current 4096x1 block layout. A ratio r means the
kernel's traversal vector work scales by ~r (leaf visits dominate).

Usage: python tools/spp_pack_sim.py [scene ...]     (default: teapot)
Env: SIM_BLOCKS (default 24) super-blocks sampled; SIM_SPP (8).
"""
import os
import sys

import numpy as np

sys.path.insert(0, ".")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from pathtracer_tpu.config import RenderConfig   # noqa: E402
from pathtracer_tpu.scene.shapes import GROUP    # noqa: E402
from pathtracer_tpu.scenes import get_scene      # noqa: E402

TILE = 4096                     # rays per packet (8 sublanes x 512)
SUPER = 64                      # super-block is 64x64 px = 4096 px
SPP = int(os.environ.get("SIM_SPP", "8"))
N_BLOCKS = int(os.environ.get("SIM_BLOCKS", "24"))
# (block_w, block_h, samples): pixels_per_tile * samples == TILE
VARIANTS = [(64, 64, 1), (32, 32, 4), (32, 16, 8), (16, 16, 16)]


def trace_wave(tree, tris, o, d, eps=1e-4):
    """One packet walk (shared scalar pointer, monolithic tile);
    returns (node_iters, leaf_visits, best_t, hit_points)."""
    bb_min, bb_max, start, is_leaf, exit_idx, leaf_size = tree
    p1s, e1s, e2s = tris
    R = o.shape[0]
    ad = np.abs(d)
    inv = np.where(ad >= eps, 1.0 / np.where(ad >= eps, d, 1), 1e30)
    bt = np.full(R, 1e30)
    hit_p = np.zeros((R, 3))
    idx, end = 0, len(is_leaf)
    iters = leafs = 0
    while idx < end:
        t1 = (bb_min[idx] - o) * inv
        t2 = (bb_max[idx] - o) * inv
        tmin = np.minimum(t1, t2).max(axis=1)
        tmax = np.maximum(t1, t2).min(axis=1)
        hit = (tmin <= tmax) & (tmax > eps) & (tmin < bt)
        anyhit = hit.any()
        iters += 1
        if anyhit and is_leaf[idx]:
            leafs += 1
            sl = np.arange(start[idx], start[idx] + leaf_size)
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
            good = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > eps)
            t = np.where(good, t, 1e30).min(axis=0)
            better = hit & (t < bt)
            bt = np.where(better, t, bt)
            hit_p = np.where(better[:, None], o + d * t[:, None], hit_p)
        idx = idx + 1 if anyhit else int(exit_idx[idx])
    return iters, leafs, bt, hit_p


def run(scene_name):
    cfg = RenderConfig(width=1280, height=960, samples=1)
    sc = get_scene(scene_name, cfg)
    scn, meta = sc.pack()
    if not meta.has_groups:
        print(f"{scene_name}: no mesh groups; skipping")
        return
    nn = meta.n_nodes
    tree = (np.asarray(scn.node_bb_min, np.float64)[:nn],
            np.asarray(scn.node_bb_max, np.float64)[:nn],
            np.asarray(scn.node_tri_start, np.int64)[:nn],
            np.asarray(scn.node_is_leaf, np.int64)[:nn],
            np.asarray(scn.node_exit, np.int64)[:nn],
            meta.leaf_size)
    tris = (np.asarray(scn.tri_p1, np.float64),
            np.asarray(scn.tri_e1, np.float64),
            np.asarray(scn.tri_e2, np.float64))
    cam = sc.camera
    inv_cam = np.asarray(cam.inverse, np.float64)
    gidx = [j for j, t in enumerate(meta.obj_types) if t == GROUP][0]
    inv_obj = np.asarray(scn.inverse, np.float64)[gidx]

    def rays_for(xs, ys, jx, jy):
        ps = float(cam.pixel_size)
        hw, hh = float(cam.half_width), float(cam.half_height)
        wx = hw - (xs + jx) * ps
        wy = hh - (ys + jy) * ps
        pix = np.stack([wx, wy, -np.ones_like(wx), np.ones_like(wx)], 1)
        pw = pix @ inv_cam.T
        ow = (np.array([0, 0, 0, 1.0]) @ inv_cam.T)[None, :]
        dirw = pw[:, :3] - ow[:, :3]
        dirw /= np.linalg.norm(dirw, axis=1, keepdims=True)
        o_l = (np.concatenate([np.broadcast_to(ow[:, :3], dirw.shape),
                               np.ones((len(dirw), 1))], 1)
               @ inv_obj.T)[:, :3]
        d_l = (np.concatenate([dirw, np.zeros((len(dirw), 1))], 1)
               @ inv_obj.T)[:, :3]
        return o_l, d_l

    rng = np.random.default_rng(0)
    # sample super-block origins on the 64-px grid, same set for every
    # variant (exact comparability over identical screen regions)
    gx = 1280 // SUPER
    gy = 960 // SUPER
    picks = rng.choice(gx * gy, size=min(N_BLOCKS, gx * gy),
                       replace=False)

    print(f"=== {scene_name} (leaf={meta.leaf_size}, "
          f"{len(picks)} super-blocks, {SPP} spp) ===")
    base = None
    for bw, bh, s in VARIANTS:
        if (SUPER // bw) * (SUPER // bh) * bw * bh != SUPER * SUPER:
            continue
        waves = SPP // min(s, SPP)
        tot_it = tot_lf = 0
        tot_bit = tot_blf = 0
        for pk in picks:
            bx0 = (pk % gx) * SUPER
            by0 = (pk // gx) * SUPER
            # sub-blocks of this super-block for this variant
            for sy in range(0, SUPER, bh):
                for sx in range(0, SUPER, bw):
                    ys_, xs_ = np.mgrid[by0 + sy:by0 + sy + bh,
                                        bx0 + sx:bx0 + sx + bw]
                    xs_ = np.tile(xs_.ravel(), min(s, SPP))
                    ys_ = np.tile(ys_.ravel(), min(s, SPP))
                    for _w in range(waves):
                        jx = rng.random(xs_.shape)
                        jy = rng.random(ys_.shape)
                        o_l, d_l = rays_for(xs_.astype(np.float64),
                                            ys_.astype(np.float64),
                                            jx, jy)
                        it, lf, bt, hp = trace_wave(tree, tris, o_l,
                                                    d_l)
                        tot_it += it
                        tot_lf += lf
                        hm = bt < 1e29
                        if hm.sum() > 32:
                            o2 = hp[hm]
                            d2 = rng.normal(size=o2.shape)
                            d2 /= np.linalg.norm(d2, axis=1,
                                                 keepdims=True)
                            bit, blf, _, _ = trace_wave(tree, tris,
                                                        o2, d2)
                            tot_bit += bit
                            tot_blf += blf
        tot = tot_lf + tot_blf
        if base is None:
            base = (tot_it + tot_bit, tot)
        print(f"  {bw:3d}x{bh:<3d} x{s:<2d}spp: "
              f"prim leafs={tot_lf:7d} bounce leafs={tot_blf:7d} "
              f"total={tot:7d} ({tot / max(1, base[1]):.2f}x) "
              f"node iters={tot_it + tot_bit:8d} "
              f"({(tot_it + tot_bit) / max(1, base[0]):.2f}x)",
              flush=True)


if __name__ == "__main__":
    for name in (sys.argv[1:] or ["teapot"]):
        run(name)
