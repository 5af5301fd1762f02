"""CPU simulator: does globally SORTING bounce rays before re-tiling
into packets reduce packet-BVH traversal cost?

Round-2 negative results (docs/PERFORMANCE.md) showed that within a
pixel tile, bounce packets saturate the node/leaf union — every ray
pays for ~every triangle — and that smaller packets or different
intra-tile chunk layouts barely help, because the 4096 rays of a pixel
tile scatter over the whole hemisphere after one diffuse bounce.

The untried lever is GLOBAL reordering: the wavefront path intersects
rays through the intersect-only Pallas kernel once per bounce, so
between bounces the host/XLA side is free to permute the whole ray
soup. If rays are sorted by (direction octant, quantized origin) and
then re-tiled, each packet is coherent again and the per-packet union
shrinks. This script replays exact packet traversal of the production
packed BVH (scene/pack.py arrays) over real primary rays and derived
cosine-weighted diffuse bounce rays, comparing:

  natural — bounce rays keep their pixel-tile packet assignment
            (what render_pass does today)
  octant  — sorted by 3-bit direction octant only
  sorted  — sorted by (octant, morton6(origin))  [6 bits/axis]
  sorted4 — sorted by (octant, morton4(origin))  [4 bits/axis]

and reporting per-packet node iterations and leaf visits (the two
costs of _packet_traverse; chunk-gating multiplies the leaf term by
live-chunks/4 which sorting also improves).

Usage: python tools/sort_sim.py [scene ...]   (default teapot gopher)
"""
import os
import sys

import numpy as np

sys.path.insert(0, ".")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from pathtracer_tpu.config import RenderConfig   # noqa: E402
from pathtracer_tpu.scenes import get_scene      # noqa: E402
from pathtracer_tpu.scene.shapes import GROUP    # noqa: E402
from tools.subpacket_sim import trace_tile       # noqa: E402

S, L = 8, 512
TILE = S * L


def cosine_dirs(rng, normals):
    """Cosine-weighted hemisphere directions around unit normals."""
    n = normals
    r1 = rng.random(len(n))
    r2 = rng.random(len(n))
    phi = 2 * np.pi * r1
    sr2 = np.sqrt(r2)
    x = np.cos(phi) * sr2
    y = np.sin(phi) * sr2
    z = np.sqrt(1 - r2)
    # build tangent frame
    a = np.where(np.abs(n[:, 0:1]) > 0.9, [[0, 1, 0.0]], [[1, 0, 0.0]])
    t = np.cross(a, n)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    b = np.cross(n, t)
    return t * x[:, None] + b * y[:, None] + n * z[:, None]


def morton(q, bits):
    """Interleave 3 coordinate arrays quantized to `bits` bits each."""
    out = np.zeros(len(q[0]), np.uint64)
    for i in range(bits):
        for ax in range(3):
            out |= ((q[ax].astype(np.uint64) >> i) & 1) << np.uint64(
                3 * i + ax)
    return out


def packet_cost(tree, tris, o, d, order=None):
    """Walk packets of TILE rays in the given order; return totals."""
    n = len(o)
    if order is not None:
        o, d = o[order], d[order]
    iters = leafs = lanes = 0
    for s in range(0, n, TILE):
        oo, dd = o[s:s + TILE], d[s:s + TILE]
        if len(oo) == 0:
            continue
        it, lf, lv, _, _ = trace_tile(
            tree, tris, oo, dd, {"c": np.arange(len(oo)) // 128})
        iters += it
        leafs += lf
        lanes += lv["c"]
    return iters, leafs, lanes


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

    # full-screen primary rays in pixel order (wavefront natural order)
    ys, xs = np.mgrid[0:960, 0:1280]
    xs = xs.ravel().astype(np.float64)
    ys = ys.ravel().astype(np.float64)
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
                           np.ones((len(dirw), 1))], 1) @ inv_obj.T)[:, :3]
    d_l = (np.concatenate([dirw, np.zeros((len(dirw), 1))], 1)
           @ inv_obj.T)[:, :3]

    # primary hit points + normals (brute packet walk, subsampled 1/4
    # of tiles for speed; keeps pixel-order contiguity)
    rng = np.random.default_rng(0)
    keep = np.zeros(len(o_l), bool)
    n_tiles = len(o_l) // TILE
    tsel = rng.choice(n_tiles, size=max(1, n_tiles // 4), replace=False)
    for tk in tsel:
        keep[tk * TILE:(tk + 1) * TILE] = True
    o_l, d_l = o_l[keep], d_l[keep]

    bt = np.full(len(o_l), 1e30)
    hp = np.zeros((len(o_l), 3))
    for s in range(0, len(o_l), TILE):
        _, _, _, t, p = trace_tile(
            tree, tris, o_l[s:s + TILE], d_l[s:s + TILE],
            {"c": np.zeros(min(TILE, len(o_l) - s), np.int64)})
        bt[s:s + TILE] = t
        hp[s:s + TILE] = p

    hmask = bt < 1e29
    o2 = hp[hmask]
    # approximate shading normals by gradient-free trick: use direction
    # from mesh centroid (cheap proxy; exact normals matter little for
    # the coherence question). Offset origins slightly outward.
    c = (tree[0][0] + tree[1][0]) / 2
    nrm = o2 - c
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True) + 1e-12
    d2 = cosine_dirs(rng, nrm)
    o2 = o2 + d2 * 1e-3
    print(f"=== {scene_name} (leaf={meta.leaf_size}) "
          f"{hmask.sum()} bounce rays from {len(o_l)} primaries ===")

    ext = tree[1][0] - tree[0][0]

    def keys(bits):
        q = [np.clip(((o2[:, ax] - tree[0][0][ax]) / ext[ax])
                     * (1 << bits), 0, (1 << bits) - 1).astype(np.int64)
             for ax in range(3)]
        oct_ = ((d2[:, 0] < 0).astype(np.uint64)
                | ((d2[:, 1] < 0).astype(np.uint64) << np.uint64(1))
                | ((d2[:, 2] < 0).astype(np.uint64) << np.uint64(2)))
        return (oct_ << np.uint64(3 * bits)) | morton(q, bits)

    def keys_morton_first(bits):
        q = [np.clip(((o2[:, ax] - tree[0][0][ax]) / ext[ax])
                     * (1 << bits), 0, (1 << bits) - 1).astype(np.int64)
             for ax in range(3)]
        oct_ = ((d2[:, 0] < 0).astype(np.uint64)
                | ((d2[:, 1] < 0).astype(np.uint64) << np.uint64(1))
                | ((d2[:, 2] < 0).astype(np.uint64) << np.uint64(2)))
        return (morton(q, bits) << np.uint64(3)) | oct_

    orders = {
        "natural": None,
        "octant": np.argsort(
            ((d2[:, 0] < 0) * 1 + (d2[:, 1] < 0) * 2
             + (d2[:, 2] < 0) * 4), kind="stable"),
        "sorted6": np.argsort(keys(6), kind="stable"),
        "sorted4": np.argsort(keys(4), kind="stable"),
        "morton8": np.argsort(morton(
            [np.clip(((o2[:, ax] - tree[0][0][ax]) / ext[ax]) * 256,
                     0, 255).astype(np.int64) for ax in range(3)], 8),
            kind="stable"),
        "mort6oct": np.argsort(keys_morton_first(6), kind="stable"),
    }
    base = None
    for name, order in orders.items():
        it, lf, lanes = packet_cost(tree, tris, o2, d2, order)
        cost = it + lf * (meta.leaf_size // 4)  # rough vec-op weight
        if base is None:
            base = (it, lf, lanes, cost)
        print(f"  {name:8s}: iters={it:7d} ({it/base[0]:.2f}x) "
              f"leafs={lf:6d} ({lf/base[1]:.2f}x) "
              f"live-chunks={lanes:7d} ({lanes/base[2]:.2f}x) "
              f"~cost {cost/base[3]:.2f}x")


if __name__ == "__main__":
    for name in (sys.argv[1:] or ["teapot", "gopher"]):
        run(name)
