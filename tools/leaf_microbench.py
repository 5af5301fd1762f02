"""Microbenchmark the megakernel's leaf triangle-test body in isolation.

The round-3 ablation pins ~98.7% of mesh-scene time on leaf vector work
(node-walk-only: 245.8 Ms/s vs 3.30 full). This harness times B
back-to-back leaf-body executions on one [8,512] ray tile — no walk, no
conds — so the per-visit cost can be attributed.

MEASUREMENT NOTE (round 4): every pallas_call dispatched through the
axon tunnel carries ~35 ms of FIXED overhead, which swamped the round-3
numbers (every variant "measured" ~13.5 us/visit = overhead/2000). This
version times each variant at VISITS and 5*VISITS and reports the
MARGINAL cost, which cancels the constant. Corrected numbers: the
production body runs ~1.8 us/visit at leaf=32 — i.e. ~74 G triangle
tests/s, and full-scene mesh throughput = leaf_rate / tests_per_sample
matches the measured 3.37 Ms/s teapot rate exactly.

Variants:
  base      exact production body (_packet_traverse leaf unroll)
  hitpoint  h = p + t*d computed once, u = h.U, v = h.V (saves ~9 of
            ~60 ops/test vs the p.U + t*(d.U) form)
  nonormal  track (t, slot) only — no smooth-normal interpolation
  tree      round-4 candidate: hitpoint u/v, per-triangle independent
            validity (no hb, no t<bt in the chain), pairwise min-TREE
            reduction carrying (t, nx, ny, nz), single per-leaf
            hb & (tw < bt) merge — short dependency chains, ~25% fewer
            ops
  treec     tree + per-triangle color payload (the gopher case)
  synth     base arithmetic with coefficients synthesized from the
            loop counter by scalar ops — no VMEM extracts, NOT
            loop-invariant (unlike the old `noload`, which XLA hoisted
            out of the loop entirely) — isolates the extract+splat cost

Usage: python tools/leaf_microbench.py [variant ...]   (default: all)
Env: MB_VISITS (20000), MB_LEAF (32).
"""
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
VISITS = int(os.environ.get("MB_VISITS", "20000"))
LEAF = int(os.environ.get("MB_LEAF", "32"))
ROWS_PER_LEAF = LEAF // pk._TRI_SLOTS_PER_ROW
EPS = 1e-4


def make_kernel(variant, n_leaves, visits):
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
            fi = (i % 7 + 1).astype(jnp.float32) * 0.1
            cand = []   # tree: per-triangle (t, payload...)
            for r in range(ROWS_PER_LEAF):
                for s in range(pk._TRI_SLOTS_PER_ROW):
                    c = s * pk._TRI_STRIDE
                    if variant == "synth":
                        # scalar-synthesized coefficients: same vector
                        # arithmetic, zero VMEM extracts, and fi keeps
                        # it loop-variant (not hoistable)
                        co = [fi * float((c + k + r) % 7 + 1)
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
                    if variant in ("hitpoint", "nonormal", "tree",
                                   "treec"):
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
                    if variant in ("tree", "treec"):
                        # independent per-triangle chain: validity via
                        # min-fold, winner found by a pairwise tree
                        valid = (den_ok & (u >= 0.0) & (v >= 0.0)
                                 & (u + v <= 1.0) & (t > EPS))
                        tv = jnp.where(valid, t, 1e30)
                        cnx = co[12] + co[15] * u + co[18] * v
                        cny = co[13] + co[16] * u + co[19] * v
                        cnz = co[14] + co[17] * u + co[20] * v
                        if variant == "treec":
                            cand.append((tv, cnx, cny, cnz,
                                         co[21] + zero, co[22] + zero,
                                         co[23] + zero))
                        else:
                            cand.append((tv, cnx, cny, cnz))
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
            if variant in ("tree", "treec"):
                while len(cand) > 1:
                    nxt = []
                    for a, b in zip(cand[::2], cand[1::2]):
                        take = b[0] < a[0]
                        nxt.append(tuple(
                            [jnp.minimum(a[0], b[0])]
                            + [jnp.where(take, b[k], a[k])
                               for k in range(1, len(a))]))
                    if len(cand) % 2:
                        nxt.append(cand[-1])
                    cand = nxt
                w = cand[0]
                won = w[0] < bt           # per-leaf merge (hb would
                bt = jnp.where(won, w[0], bt)   # join here in prod)
                gnx = jnp.where(won, w[1], gnx)
                gny = jnp.where(won, w[2], gny)
                gnz = jnp.where(won, w[3], gnz)
            return bt, gnx, gny, gnz

        bt, gnx, gny, gnz = jax.lax.fori_loop(
            0, visits, visit,
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

    def timed(variant, visits):
        fn = pl.pallas_call(
            make_kernel(variant, n_leaves, visits),
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
        return best

    for variant in (sys.argv[1:] or ["base", "hitpoint", "nonormal",
                                     "tree", "treec", "synth"]):
        t1 = timed(variant, VISITS)
        t5 = timed(variant, VISITS * 5)
        marginal = (t5 - t1) / (VISITS * 4)
        tests = marginal and LEAF / marginal / 1e9
        print(f"{variant:9s} {t1*1e3:8.2f} / {t5*1e3:8.2f} ms at "
              f"{VISITS}/{VISITS*5} visits (leaf={LEAF}) -> "
              f"{marginal*1e9:8.1f} ns/visit marginal, "
              f"{tests:6.1f} G tests/s", flush=True)


if __name__ == "__main__":
    main()
