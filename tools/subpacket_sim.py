"""CPU simulator for the sub-packet leaf-gating cost model.

`_packet_traverse` (render/pallas_kernel.py) walks ONE node pointer per
(8,512) ray tile but runs each leaf's triangle unroll under a PER-CHUNK
cond over the tile's four 128-lane chunks. The vector work a leaf costs
is therefore proportional to how many chunks are LIVE (slab-hit) at that
leaf, and the tile order decides which rays share a chunk:

  block    — a chunk is interleaved 64-wide stripes of the 64x64 block
  subblock — a chunk is a compact 32x32 quadrant (tile_pixel_layout)

This script replays exact packet traversal of the PRODUCTION packed BVH
(scene/pack.py arrays — the same tree the kernel walks) over real
primary packets and derived diffuse-bounce packets, and reports, per
order: node iterations (identical across orders — the walk is shared),
leaf visits, and the number of live leaf-chunks. Ungated vector cost is
leaf_visits * nc; the gated cost is leaf_chunks_live. The ratio predicts
the hardware A/B (docs/PERFORMANCE.md).

Usage: python tools/subpacket_sim.py [scene ...]   (default teapot gopher)
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

from pathtracer_tpu.config import RenderConfig   # noqa: E402
from pathtracer_tpu.scenes import get_scene      # noqa: E402
from pathtracer_tpu.scene.shapes import GROUP    # noqa: E402

S, L, NC = 8, 512, 4
TILE = S * L


def trace_tile(tree, tris, o, d, chunk_sets, eps=1e-4):
    """One packet walk; per-leaf, count live chunks for every chunk
    assignment in `chunk_sets` (dict name -> [R] chunk ids)."""
    bb_min, bb_max, start, is_leaf, exit_idx, leaf_size = tree
    p1s, e1s, e2s = tris
    R = o.shape[0]
    ad = np.abs(d)
    inv = np.where(ad >= eps, 1.0 / np.where(ad >= eps, d, 1), 1e30)
    bt = np.full(R, 1e30)
    hit_p = np.zeros((R, 3))
    idx, end = 0, len(is_leaf)
    iters = leafs = 0
    live = {k: 0 for k in chunk_sets}
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
            for name, cid in chunk_sets.items():
                live[name] += len(np.unique(cid[hit]))
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
            good = (ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > eps))
            t = np.where(good, t, 1e30).min(axis=0)
            better = hit & (t < bt)
            bt = np.where(better, t, bt)
            hit_p = np.where(better[:, None], o + d * t[:, None], hit_p)
        idx = idx + 1 if anyhit else int(exit_idx[idx])
    return iters, leafs, live, bt, hit_p


def run(scene_name):
    from pathtracer_tpu.render.pallas_kernel import tile_pixel_layout

    cfg = RenderConfig(width=1280, height=960, samples=1)
    sc = get_scene(scene_name, cfg)
    scn, meta = sc.pack()
    if not meta.has_groups:
        print(f"{scene_name}: no mesh groups; skipping")
        return

    # copy 0 of the node pool is the original DFS order (copies 1-8 are
    # the octant-reordered duplicates; the walk must stay inside one)
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

    # per-order pixel layouts over the SAME blocks: same 4096 pixels per
    # tile, different slot->chunk assignment
    layouts = {o: tile_pixel_layout(1280, 960, S, L, order=o)
               for o in ("block", "subblock")}
    n_rows = layouts["block"][0].shape[0]
    n_tiles_all = n_rows // S

    def rays_for(xs, ys):
        ps = float(cam.pixel_size)
        hw, hh = float(cam.half_width), float(cam.half_height)
        wx = hw - (xs + 0.5) * ps
        wy = hh - (ys + 0.5) * ps
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
    # cover EVERY tile: mesh-overlapping blocks are a small fraction of
    # the screen and random sampling mostly finds root-miss tiles
    sample = np.arange(n_tiles_all)

    tot = {"prim_iters": 0, "prim_leafs": 0, "bnc_iters": 0,
           "bnc_leafs": 0}
    liv = {f"{ph}_{o}": 0 for ph in ("prim", "bnc")
           for o in ("block", "subblock")}
    for tk in sample:
        # the BLOCK layout's tile tk: pixels + both chunk assignments.
        # block chunk id of slot k: (k % L) // 128; the subblock order
        # permutes the same pixels, so map pixel -> subblock chunk via
        # its pid.
        pxb, pyb, pidb = layouts["block"]
        sl = slice(tk * S, (tk + 1) * S)
        xs = pxb[sl].ravel().astype(np.float64)
        ys = pyb[sl].ravel().astype(np.float64)
        k = np.arange(TILE)
        cid_block = (k % L) // 128
        # subblock chunk of each pixel: position of the same (x,y) in
        # the subblock layout
        pxs, pys, pids = layouts["subblock"]
        pid_tile = (ys.astype(np.int64) * 1280 + xs.astype(np.int64))
        pos = {}
        sxs = pxs[sl].ravel().astype(np.int64)
        sys_ = pys[sl].ravel().astype(np.int64)
        spid = sys_ * 1280 + sxs
        for i, p in enumerate(spid):
            pos.setdefault(int(p), (i % L) // 128)
        cid_sub = np.array([pos[int(p)] for p in pid_tile])

        o_l, d_l = rays_for(xs, ys)
        it, lf, lv, bt, hp = trace_tile(
            tree, tris, o_l, d_l,
            {"block": cid_block, "subblock": cid_sub})
        tot["prim_iters"] += it
        tot["prim_leafs"] += lf
        liv["prim_block"] += lv["block"]
        liv["prim_subblock"] += lv["subblock"]

        hmask = bt < 1e29
        if hmask.sum() > 64:
            o2 = hp[hmask]
            d2 = rng.normal(size=o2.shape)
            d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
            it, lf, lv, _, _ = trace_tile(
                tree, tris, o2, d2,
                {"block": cid_block[hmask], "subblock": cid_sub[hmask]})
            tot["bnc_iters"] += it
            tot["bnc_leafs"] += lf
            liv["bnc_block"] += lv["block"]
            liv["bnc_subblock"] += lv["subblock"]

    print(f"=== {scene_name} (leaf={meta.leaf_size}, "
          f"{len(sample)} tiles) ===")
    for ph in ("prim", "bnc"):
        ungated = tot[f"{ph}_leafs"] * NC
        print(f"  {ph:4s}: iters={tot[f'{ph}_iters']:7d} "
              f"leafs={tot[f'{ph}_leafs']:6d} "
              f"chunk-work ungated={ungated:7d} "
              f"gated/block={liv[f'{ph}_block']:7d} "
              f"({liv[f'{ph}_block'] / max(1, ungated):.2f}x) "
              f"gated/subblock={liv[f'{ph}_subblock']:7d} "
              f"({liv[f'{ph}_subblock'] / max(1, ungated):.2f}x)")


if __name__ == "__main__":
    for name in (sys.argv[1:] or ["teapot", "gopher"]):
        run(name)
