"""A/B experiment: BVH build strategies under the megakernel's PACKET
cost model.

The megakernel's packet traversal (render/pallas_kernel.py:_packet_traverse)
pays ONE while-loop iteration per *visited node* for the whole ray tile,
plus a fixed-size vectorized triangle unroll per visited leaf. Tree quality
therefore = minimize (node visits, leaf visits-weighted-by-leaf-size) per
packet. This script simulates exact packet traversal — including best-t
pruning from real triangle hits — on real primary packets AND derived
diffuse-bounce packets, for several build strategies.

Usage: python tools/bvh_experiment.py [scene ...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import os
# This is a CPU-only simulator: hard-pin the platform. The axon TPU
# plugin pre-sets JAX_PLATFORMS=axon at interpreter start (so setdefault
# would keep it) and re-reads it lazily — both the env var AND
# jax.config must be forced BEFORE any backend init, or the tool
# silently attaches the TPU tunnel (tests/conftest.py, same workaround).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.scenes import get_scene
from pathtracer_tpu.scene.pack import pack_scene
from pathtracer_tpu.scene.shapes import GROUP


# --------------------------------------------------------------------------
# Builders: all emit skip-link arrays (bb_min, bb_max, is_leaf, exit, slots)
# --------------------------------------------------------------------------

def _emit_tree(split_fn, bmin, bmax, cent, leaf_size):
    rec = {"bb_min": [], "bb_max": [], "start": [], "leaf": [], "exit": [],
           "slots": []}

    def emit(ids):
        my = len(rec["bb_min"])
        rec["bb_min"].append(bmin[ids].min(axis=0))
        rec["bb_max"].append(bmax[ids].max(axis=0))
        rec["start"].append(0)
        rec["leaf"].append(0)
        rec["exit"].append(0)
        if len(ids) <= leaf_size:
            rec["leaf"][my] = 1
            rec["start"][my] = len(rec["slots"])
            rec["slots"].extend(int(t) for t in ids)
            rec["slots"].extend([-1] * (leaf_size - len(ids)))
        else:
            mask = split_fn(ids)
            emit(ids[mask])
            emit(ids[~mask])
        rec["exit"][my] = len(rec["bb_min"])

    emit(np.arange(len(bmin)))
    return (np.stack(rec["bb_min"]) - 1e-4, np.stack(rec["bb_max"]) + 1e-4,
            np.asarray(rec["start"], np.int32),
            np.asarray(rec["leaf"], np.int32),
            np.asarray(rec["exit"], np.int32),
            np.asarray(rec["slots"], np.int32))


def build_median(bmin, bmax, cent, leaf_size):
    """Current builder: median-count split of longest centroid axis."""
    def split(ids):
        c = cent[ids]
        ext = c.max(axis=0) - c.min(axis=0)
        axis = int(np.argmax(ext))
        order = np.argsort(c[:, axis], kind="stable")
        half = len(ids) // 2
        mask = np.zeros(len(ids), bool)
        mask[order[:half]] = True
        return mask
    return _emit_tree(split, bmin, bmax, cent, leaf_size)


def build_snapped(bmin, bmax, cent, leaf_size):
    """Median split SNAPPED to a multiple of leaf_size so every leaf ends
    up exactly full -> minimum possible node count."""
    def split(ids):
        c = cent[ids]
        ext = c.max(axis=0) - c.min(axis=0)
        axis = int(np.argmax(ext))
        order = np.argsort(c[:, axis], kind="stable")
        n_leaves = -(-len(ids) // leaf_size)
        left_leaves = n_leaves // 2
        half = min(left_leaves * leaf_size, len(ids) - 1)
        mask = np.zeros(len(ids), bool)
        mask[order[:half]] = True
        return mask
    return _emit_tree(split, bmin, bmax, cent, leaf_size)


def build_sah(bmin, bmax, cent, leaf_size, n_bins=16):
    """Binned SAH (min A_L*N_L + A_R*N_R over 3 axes x bins)."""
    def area(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] \
            + d[..., 2] * d[..., 0]

    def split(ids):
        c = cent[ids]
        cmin = c.min(axis=0)
        cmax = c.max(axis=0)
        best = None
        for axis in range(3):
            ext = cmax[axis] - cmin[axis]
            if ext <= 0.0:
                continue
            b = np.minimum(((c[:, axis] - cmin[axis]) * (n_bins / ext))
                           .astype(np.int64), n_bins - 1)
            counts = np.bincount(b, minlength=n_bins)
            binmn = np.full((n_bins, 3), np.inf)
            binmx = np.full((n_bins, 3), -np.inf)
            for k in np.nonzero(counts)[0]:
                sel = b == k
                binmn[k] = bmin[ids[sel]].min(axis=0)
                binmx[k] = bmax[ids[sel]].max(axis=0)
            lcnt = np.cumsum(counts)[:-1]
            rcnt = len(ids) - lcnt
            lmn = np.minimum.accumulate(binmn, axis=0)
            lmx = np.maximum.accumulate(binmx, axis=0)
            rmn = np.minimum.accumulate(binmn[::-1], axis=0)[::-1]
            rmx = np.maximum.accumulate(binmx[::-1], axis=0)[::-1]
            for k in range(n_bins - 1):
                if lcnt[k] == 0 or rcnt[k] == 0:
                    continue
                cost = (area(lmn[k], lmx[k]) * lcnt[k]
                        + area(rmn[k + 1], rmx[k + 1]) * rcnt[k])
                if best is None or cost < best[0]:
                    best = (cost, b <= k)
        if best is None:
            half = len(ids) // 2
            mask = np.zeros(len(ids), bool)
            mask[:half] = True
            return mask
        return best[1]
    return _emit_tree(split, bmin, bmax, cent, leaf_size)


def build_sah_snapped(bmin, bmax, cent, leaf_size, n_bins=16):
    """SAH axis/plane choice, then snap the partition point to a multiple
    of leaf_size along that axis order (full leaves + SAH-ish quality)."""
    def area(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] \
            + d[..., 2] * d[..., 0]

    def split(ids):
        c = cent[ids]
        cmin = c.min(axis=0)
        cmax = c.max(axis=0)
        best = None
        for axis in range(3):
            ext = cmax[axis] - cmin[axis]
            if ext <= 0.0:
                continue
            order = np.argsort(c[:, axis], kind="stable")
            smin = bmin[ids[order]]
            smax = bmax[ids[order]]
            lmn = np.minimum.accumulate(smin, axis=0)
            lmx = np.maximum.accumulate(smax, axis=0)
            rmn = np.minimum.accumulate(smin[::-1], axis=0)[::-1]
            rmx = np.maximum.accumulate(smax[::-1], axis=0)[::-1]
            # candidate cuts at multiples of leaf_size
            cuts = np.arange(leaf_size, len(ids), leaf_size)
            if not len(cuts):
                continue
            cost = (area(lmn[cuts - 1], lmx[cuts - 1]) * cuts
                    + area(rmn[cuts], rmx[cuts]) * (len(ids) - cuts))
            k = int(np.argmin(cost))
            if best is None or cost[k] < best[0]:
                mask = np.zeros(len(ids), bool)
                mask[order[:cuts[k]]] = True
                best = (cost[k], mask)
        if best is None:
            half = len(ids) // 2
            mask = np.zeros(len(ids), bool)
            mask[:half] = True
            return mask
        return best[1]
    return _emit_tree(split, bmin, bmax, cent, leaf_size)


BUILDERS = {
    "median(cur)": build_median,
    "snapped": build_snapped,
    "sah": build_sah,
    "sah-snap": build_sah_snapped,
}


# --------------------------------------------------------------------------
# Packet traversal simulator WITH triangle hits (best-t pruning)
# --------------------------------------------------------------------------

def packet_trace(tree, tris, o, d, eps=1e-4):
    """Simulate _packet_traverse for ONE packet. tris = (p1,e1,e2) indexed
    by slot ids. Returns (iters, leaf_visits, t, hit_normal_dummy)."""
    bb_min, bb_max, start, is_leaf, exit_idx, slots = tree
    p1s, e1s, e2s = tris
    R = o.shape[0]
    ad = np.abs(d)
    inv = np.where(ad >= eps, 1.0 / np.where(ad >= eps, d, 1), 1e30)
    bt = np.full(R, 1e30)
    hit_p1 = np.zeros((R, 3))
    idx, end = 0, len(is_leaf)
    iters = leafs = 0
    leaf_size = (len(slots) // max(1, int(is_leaf.sum()))) \
        if is_leaf.sum() else 0
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
            s0 = start[idx]
            sl = slots[s0:s0 + leaf_size]
            sl = sl[sl >= 0]
            if len(sl):
                # vectorized over slots AND rays: [S,1,3] x [1,R,3]
                e1 = e1s[sl][:, None, :]
                e2 = e2s[sl][:, None, :]
                p1 = p1s[sl][:, None, :]
                dn = d[None, :, :]
                dc2 = np.cross(dn, e2)
                det = (e1 * dc2).sum(axis=2)          # [S,R]
                ok = np.abs(det) >= eps
                f = 1.0 / np.where(ok, det, 1.0)
                pv = o[None, :, :] - p1
                u = f * (pv * dc2).sum(axis=2)
                oc = np.cross(pv, e1)
                v = f * (dn * oc).sum(axis=2)
                t = f * (e2 * oc).sum(axis=2)
                good = (ok & (u >= 0) & (u <= 1) & (v >= 0)
                        & (u + v <= 1) & (t > eps))
                t = np.where(good, t, 1e30).min(axis=0)  # [R]
                better = hit & (t < bt)
                bt = np.where(better, t, bt)
                hit_p1 = np.where(better[:, None], o + d * t[:, None],
                                  hit_p1)
        idx = idx + 1 if anyhit else int(exit_idx[idx])
    return iters, leafs, bt, hit_p1


def experiment(scene_name, leaf_sizes):
    cfg = RenderConfig(width=1280, height=960, samples=1)
    sc = get_scene(scene_name, cfg)
    scn, meta = pack_scene(sc.objects)
    if not meta.has_groups:
        print(f"{scene_name}: no mesh groups; skipping")
        return

    # recover tri soup from packed slots
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

    W, H = 1280, 960
    TILE = 4096
    ys, xs = np.mgrid[0:H, 0:W]
    xs = xs.ravel(); ys = ys.ravel()
    ps = float(cam.pixel_size)
    hw, hh = float(cam.half_width), float(cam.half_height)
    wx = hw - (xs + 0.5) * ps
    wy = hh - (ys + 0.5) * ps
    pix = np.stack([wx, wy, -np.ones_like(wx), np.ones_like(wx)], axis=1)
    pw = pix @ inv_cam.T
    ow = (np.array([0, 0, 0, 1.0]) @ inv_cam.T)[None, :].repeat(len(pw), 0)
    dirw = pw[:, :3] - ow[:, :3]
    dirw /= np.linalg.norm(dirw, axis=1, keepdims=True)
    o_loc = (np.concatenate([ow[:, :3], np.ones((len(ow), 1))], 1)
             @ inv_obj.T)[:, :3]
    d_loc = (np.concatenate([dirw, np.zeros((len(ow), 1))], 1)
             @ inv_obj.T)[:, :3]

    rng = np.random.default_rng(0)
    n_pack = (W * H) // TILE
    sample = rng.choice(n_pack, size=min(24, n_pack), replace=False)

    print(f"=== {scene_name} ({valid.sum()} tris) ===")
    for leaf_size in leaf_sizes:
        for name, builder in BUILDERS.items():
            t0 = time.time()
            tree = builder(tb_min, tb_max, centr, leaf_size)
            tb = time.time() - t0
            n_nodes = len(tree[3])
            pit = plf = bit = blf = 0
            for pk in sample:
                sl = slice(pk * TILE, (pk + 1) * TILE)
                it, lf, bt, hp = packet_trace(tree, tris, o_loc[sl],
                                              d_loc[sl])
                pit += it; plf += lf
                # bounce packet: hemisphere dirs from the actual hit points
                hmask = bt < 1e29
                if hmask.sum() > 64:
                    o2 = hp[hmask]
                    d2 = rng.normal(size=o2.shape)
                    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
                    it2, lf2, _, _ = packet_trace(tree, tris, o2, d2)
                    bit += it2; blf += lf2
            print(f"  leaf={leaf_size:3d} {name:12s} nodes={n_nodes:5d} "
                  f"build={tb:5.2f}s | primary it={pit:6d} lf={plf:5d} "
                  f"| bounce it={bit:6d} lf={blf:5d} "
                  f"| weighted={pit + bit + (plf + blf) * leaf_size // 16}")


if __name__ == "__main__":
    names = sys.argv[1:] or ["teapot", "gopher"]
    for name in names:
        experiment(name, leaf_sizes=[16, 32, 64])
