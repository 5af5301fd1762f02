"""Microbenchmark the megakernel's leaf triangle-test body in isolation.

The round-3 ablation pins ~98.7% of mesh-scene time on leaf vector work
(node-walk-only: 245.8 Ms/s vs 3.30 full), yet op-count accounting says
that work runs at only ~28% of the VPU rate the primitive megakernel
sustains. This harness times B back-to-back leaf-body executions on one
[8,512] ray tile — no walk, no conds — so the gap can be attributed:

  base      exact production body (_packet_traverse leaf unroll)
  hitpoint  h = p + t*d computed once, u = h.U, v = h.V (saves ~5 of
            ~45 ops/test vs the p.U + t*(d.U) form)
  nonormal  track (t, slot) only — no smooth-normal interpolation
  noload    all 24 triangle coefficients hoisted to compile-time
            constants — isolates the VMEM scalar-load + splat cost
  indep     noload arithmetic but NO cross-triangle dependency at all
            (accumulate sum of t) — the pure-throughput/ILP ceiling
  mintree   hitpoint t-chain, but the best-t reduction is
            tmin = min(tmin, where(valid, t, BIG)) and the payload
            (normal) selects keyed afterwards on t == tmin — shortens
            the serial select chain per triangle from 4 to 1

Usage: python tools/leaf_microbench.py [variant ...]   (default: all)
Env: MB_VISITS (2000), MB_LEAF (32).
"""
import functools
import math
import os
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from pathtracer_tpu.config import RenderConfig  # noqa: E402
from pathtracer_tpu.render import pallas_kernel as pk  # noqa: E402
from pathtracer_tpu.scenes import get_scene  # noqa: E402

S, L = (int(v) for v in os.environ.get("MB_TILE", "8x512").split("x"))
VISITS = int(os.environ.get("MB_VISITS", "2000"))
LEAF = int(os.environ.get("MB_LEAF", "32"))
ROWS_PER_LEAF = LEAF // pk._TRI_SLOTS_PER_ROW
EPS = 1e-4


def make_kernel(variant, n_leaves):
    def kernel(tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               t_out, x_out):
        tox = ox_ref[...]
        toy = oy_ref[...]
        toz = oz_ref[...]
        tdx = dx_ref[...]
        tdy = dy_ref[...]
        tdz = dz_ref[...]
        shape = tox.shape
        zero = jnp.zeros(shape, jnp.float32)

        def visit(i, carry):
            bt, gnx, gny, gnz = carry
            r0 = (i % n_leaves) * ROWS_PER_LEAF
            block = tri_ref[pl.ds(r0, ROWS_PER_LEAF), :]
            cand = []   # mintree: per-triangle (t, u, v, valid)
            for r in range(ROWS_PER_LEAF):
                for s in range(pk._TRI_SLOTS_PER_ROW):
                    c = s * pk._TRI_STRIDE
                    if variant in ("noload", "indep"):
                        # compile-time constants: no VMEM extract+splat
                        co = [0.1 * ((c + k + r) % 7 + 1)
                              for k in range(24)]
                    else:
                        co = [block[r, c + k] for k in range(24)]
                    pxx = tox - co[0]
                    pyy = toy - co[1]
                    pzz = toz - co[2]
                    den = tdx * co[3] + tdy * co[4] + tdz * co[5]
                    num_t = -(pxx * co[3] + pyy * co[4] + pzz * co[5])
                    den_ok = jnp.abs(den) >= EPS
                    f = 1.0 / jnp.where(den_ok, den, 1.0)
                    t = num_t * f
                    if variant in ("hitpoint", "nonormal", "indep",
                                   "mintree"):
                        hx = pxx + t * tdx
                        hy = pyy + t * tdy
                        hz = pzz + t * tdz
                        u = hx * co[6] + hy * co[7] + hz * co[8]
                        v = hx * co[9] + hy * co[10] + hz * co[11]
                    else:
                        u = (pxx * co[6] + pyy * co[7] + pzz * co[8]
                             + t * (tdx * co[6] + tdy * co[7]
                                    + tdz * co[8]))
                        v = (pxx * co[9] + pyy * co[10] + pzz * co[11]
                             + t * (tdx * co[9] + tdy * co[10]
                                    + tdz * co[11]))
                    if variant == "indep":
                        # no cross-triangle dependency: ILP ceiling
                        bt = bt + t * u
                        gnx = gnx + v
                        continue
                    if variant == "mintree":
                        # per-triangle chains fully independent; the
                        # winner is folded in a pairwise tree AFTER the
                        # unroll (log2(K) select depth, not K)
                        valid = (den_ok & (u >= 0.0) & (v >= 0.0)
                                 & (u + v <= 1.0) & (t > EPS))
                        tv = jnp.where(valid, t, 1e30)
                        cand.append((tv, u, v))
                        continue
                    better = (den_ok & (u >= 0.0) & (v >= 0.0)
                              & (u + v <= 1.0) & (t > EPS) & (t < bt))
                    if variant == "nonormal":
                        sidf = jnp.float32(r * 4 + s)
                        bt = jnp.where(better, t, bt)
                        gnx = jnp.where(better, sidf, gnx)
                    else:
                        cnx = co[12] + co[15] * u + co[18] * v
                        cny = co[13] + co[16] * u + co[19] * v
                        cnz = co[14] + co[17] * u + co[20] * v
                        bt = jnp.where(better, t, bt)
                        gnx = jnp.where(better, cnx, gnx)
                        gny = jnp.where(better, cny, gny)
                        gnz = jnp.where(better, cnz, gnz)
            if variant == "mintree":
                while len(cand) > 1:
                    nxt = []
                    for a, b in zip(cand[::2], cand[1::2]):
                        take = b[0] < a[0]
                        nxt.append((jnp.minimum(a[0], b[0]),
                                    jnp.where(take, b[1], a[1]),
                                    jnp.where(take, b[2], a[2])))
                    if len(cand) % 2:
                        nxt.append(cand[-1])
                    cand = nxt
                tw, uw, vw = cand[0]
                won = tw < bt
                bt = jnp.minimum(bt, tw)
                gnx = jnp.where(won, uw, gnx)
                gny = jnp.where(won, vw, gny)
                gnz = jnp.where(won, uw * vw, gnz)
            return bt, gnx, gny, gnz

        bt, gnx, gny, gnz = jax.lax.fori_loop(
            0, VISITS, visit,
            (jnp.full(shape, 1e30, jnp.float32), zero, zero, zero))
        t_out[...] = bt
        x_out[...] = gnx
    return kernel


def main():
    cfg = RenderConfig(width=1280, height=960, samples=1)
    os.environ["PT_BVH_LEAF"] = str(LEAF)
    sc = get_scene("teapot", cfg)
    arrays, meta = sc.pack()
    _, _, tris = pk.scene_tables_jnp(arrays, meta)
    n_rows = int(tris.shape[0])
    n_leaves = max(1, n_rows // ROWS_PER_LEAF - 1)

    # real primary rays (object space is irrelevant for timing)
    xs, ys, _pid = pk.tile_pixel_layout(1280, 960, S, L, order="block")
    fx = xs[:S].astype(np.float32)
    fy = ys[:S].astype(np.float32)
    o = np.zeros((S, L), np.float32)
    args = [jnp.asarray(a) for a in
            (o + 0.1, o + 0.2, o - 1.5,
             (fx - 640) / 640, (fy - 480) / 480, o + 1.0)]

    n_tests = VISITS * LEAF
    for variant in (sys.argv[1:] or ["base", "hitpoint", "nonormal",
                                     "noload"]):
        fn = pl.pallas_call(
            make_kernel(variant, n_leaves),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_shape=[jax.ShapeDtypeStruct((S, L), jnp.float32)] * 2,
        )
        t, x = fn(tris, *args)
        float(t.mean())  # materialize (compile)
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            t, x = fn(tris, *args)
            float(t.mean())
            best = min(best, time.perf_counter() - t0)
        ns_visit = best / VISITS * 1e9
        ops = n_tests * 45 * S * L / best / 1e12
        print(f"{variant:9s} {best*1e3:8.2f} ms for {VISITS} visits "
              f"(leaf={LEAF}) -> {ns_visit:8.1f} ns/visit, "
              f"{ops:6.2f} T 'op-equiv'/s (45-op basis)", flush=True)


if __name__ == "__main__":
    main()
