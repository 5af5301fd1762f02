"""Ground-truth probe: what vector-op rate can a Pallas kernel actually
sustain on this chip, and where does the leaf body sit against it?

Round-3's leaf microbench showed EVERY variant of the leaf body --
including `indep` (compile-time constants, no cross-triangle deps) --
running at ~0.45 T op-equiv/s, while the primitive megakernel's flop
accounting suggested ~3 TFLOP/s. One of those numbers is mis-accounted.
This probe measures, with exact op counting:

  fma_dep    one serial FMA chain            -> latency bound
  fma_par8   8 independent FMA chains        -> FMA throughput bound
  mul_par8   8 independent mul chains        -> non-FMA ALU rate
  cmp_sel    compare + select mix (the leaf body's mask ops)
  leafmix    the indep leaf arithmetic, no refs, no block read

Each at tile shapes (8,512), (16,512), (32,512).

Usage: python tools/vpu_peak_probe.py
Env: PB_ITERS (2000), PB_UNROLL (32)
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

ITERS = int(os.environ.get("PB_ITERS", "2000"))
UNROLL = int(os.environ.get("PB_UNROLL", "32"))
EPS = 1e-4


def make_kernel(variant):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        shape = x.shape

        if variant == "fma_dep":
            def body(i, a):
                for k in range(UNROLL):
                    a = a * 1.000001 + 0.5  # serial chain
                return a
            ops_per_iter = UNROLL
            o_ref[...] = jax.lax.fori_loop(0, ITERS, body, x)
            return ops_per_iter

        if variant in ("fma_par8", "mul_par8"):
            def body(i, carry):
                cs = list(carry)
                for k in range(UNROLL):
                    j = k % 8
                    if variant == "fma_par8":
                        cs[j] = cs[j] * 1.000001 + 0.5
                    else:
                        cs[j] = cs[j] * 1.000001
                return tuple(cs)
            init = tuple(x + 0.01 * j for j in range(8))
            out = jax.lax.fori_loop(0, ITERS, body, init)
            o_ref[...] = sum(out)
            return UNROLL

        if variant == "cmp_sel":
            def body(i, carry):
                cs = list(carry)
                for k in range(0, UNROLL, 2):
                    j = k % 8
                    m = cs[j] > cs[(j + 1) % 8]          # cmp
                    cs[j] = jnp.where(m, cs[j] * 0.9999,  # sel+mul
                                      cs[j] + 0.0001)
                return tuple(cs)
            init = tuple(x + 0.01 * j for j in range(8))
            out = jax.lax.fori_loop(0, ITERS, body, init)
            o_ref[...] = sum(out)
            return UNROLL + UNROLL // 2  # 2 issue-slots per pair + sel arith

        if variant == "leafmix":
            # the `indep` leaf arithmetic verbatim, constants folded,
            # NO tri_ref read at all
            tox, toy, toz = x, x + 0.1, x - 1.5
            tdx, tdy, tdz = x * 0.01, x * 0.02, x + 1.0

            def body(i, carry):
                bt, gnx = carry
                for s in range(UNROLL):
                    co = [0.1 * ((s + k) % 7 + 1) for k in range(24)]
                    pxx = tox - co[0]
                    pyy = toy - co[1]
                    pzz = toz - co[2]
                    den = tdx * co[3] + tdy * co[4] + tdz * co[5]
                    num_t = -(pxx * co[3] + pyy * co[4] + pzz * co[5])
                    den_ok = jnp.abs(den) >= EPS
                    f = 1.0 / jnp.where(den_ok, den, 1.0)
                    t = num_t * f
                    hx = pxx + t * tdx
                    hy = pyy + t * tdy
                    hz = pzz + t * tdz
                    u = hx * co[6] + hy * co[7] + hz * co[8]
                    v = hx * co[9] + hy * co[10] + hz * co[11]
                    bt = bt + t * u
                    gnx = gnx + v
                return bt, gnx
            bt, gnx = jax.lax.fori_loop(
                0, ITERS, body, (jnp.zeros(shape, jnp.float32),
                                 jnp.zeros(shape, jnp.float32)))
            o_ref[...] = bt + gnx
            # exact issue-slot count per triangle (FMA = 1 slot):
            # pxx/pyy/pzz 3, den 3 (mul+2fma->3), num_t 4, abs 1, cmp 1,
            # where 1, recip ~4 (NR), t 1, hx/hy/hz 3, u 3, v 3,
            # bt fma 1, gnx add 1  => ~30 slots PER TRIANGLE, and the
            # body unrolls UNROLL triangles per fori iteration (round-5
            # fix: the original returned 30, a 32x under-count that
            # would have reported leafmix 32x slower than reality)
            return 30 * UNROLL
    return kernel


def main():
    shapes = [(8, 512), (16, 512), (32, 512), (8, 128)]
    variants = sys.argv[1:] or ["fma_dep", "fma_par8", "mul_par8",
                                "cmp_sel", "leafmix"]
    for S, L in shapes:
        x = jnp.asarray(np.random.rand(S, L).astype(np.float32) + 1.0)
        for variant in variants:
            k = make_kernel(variant)
            ops_holder = {}

            def kernel(x_ref, o_ref, _k=k, _h=ops_holder):
                _h["ops"] = _k(x_ref, o_ref)

            fn = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
            )
            r = fn(x)
            float(r.mean())
            best = 1e30
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(x).mean())
                best = min(best, time.perf_counter() - t0)
            slots = ops_holder["ops"] * ITERS
            lanes = S * L
            tops = slots * lanes / best / 1e12
            # cycles per (8,128)-vreg op at 940 MHz
            vregs = max(1, (S // 8) * (L // 128))
            cyc = best * 0.94e9 / (slots * vregs)
            print(f"({S:2d},{L:4d}) {variant:9s} {best*1e3:8.2f} ms "
                  f"{tops:6.2f} T slot/s  {cyc:5.2f} cyc/vreg-op",
                  flush=True)


if __name__ == "__main__":
    main()
