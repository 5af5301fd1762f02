"""Settle the image-texture boundary empirically (VERDICT r2 #9).

The megakernel computes PROCEDURAL texels in-kernel; file-backed image
textures fall back to the wavefront path because Pallas TPU has no
per-lane gather (PERFORMANCE.md "gather wall"). This probe measures the
one remaining candidate: stage a small (<=128-row) texture in VMEM and
fetch texels with MXU ALGEBRA instead of a gather —

    fetch(iy, ix) = sum_h sum_w tex[h, w] * (iy == h) * (ix == w)

factored as, per 128-lane sublane row of the index tile:
    M[h, l] = (iy[l] == h)            # [H, L] iota compare
    S = M^T @ tex_rgb                 # [L, 3W] one MXU matmul
    out[l, c] = sum_w S[l, cW + w] * (ix[l] == w)   # masked lane-reduce

Cost model: 1 [128,128]@[128,384] matmul + 4 [128,128]-ish vector ops
per 128 fetched texels -> ~6.3 MMAC / 128 texels. The wavefront's XLA
flat-pool gather runs ~250 Melem/s (tools/gather_bench.py); if this
lands >=1 Gfetch/s the boundary is engineering, not physics, and small
file-backed textures can ride the megakernel.

Usage:
    JAX_PLATFORMS=cpu python tools/tex_vmem_probe.py --check   # parity
    python tools/tex_vmem_probe.py                             # TPU timing

Reference capability being probed: image2d_array_t sampling in the hot
loop, /root/reference/internal/ocl/tracer.cl:829,1077-1093.
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H_TEX = 128          # staged texture rows (the probe's size class)
W_TEX = 128          # texel columns (pads to the 128-lane tile anyway)


def _fetch_block(tex_rgb, iy, ix):
    """One-hot texel fetch for one [8, 128] index tile.

    tex_rgb: [H_TEX, 3*W_TEX] f32 (r|g|b planes side by side).
    iy, ix:  [8, 128] i32 texel coordinates.
    Returns (r, g, b) [8, 128] f32.
    """
    outs = []
    col = jax.lax.broadcasted_iota(jnp.int32, (H_TEX, 128), 0)
    wcol = jax.lax.broadcasted_iota(jnp.int32, (128, W_TEX), 1)
    for s in range(8):
        # M[h, l] = (iy[s, l] == h): compare against a broadcast row
        iy_row = jax.lax.broadcast_in_dim(iy[s], (H_TEX, 128), (1,))
        m = (col == iy_row).astype(jnp.float32)          # [H, L]
        # S = M^T @ tex_rgb -> [L, 3W] (one MXU pass)
        sel = jax.lax.dot_general(
            m, tex_rgb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [128, 3W]
        ix_row = jax.lax.broadcast_in_dim(ix[s], (128, W_TEX), (0,))
        n = (wcol == ix_row).astype(jnp.float32)          # [L, W]
        outs.append([
            jnp.sum(sel[:, c * W_TEX:(c + 1) * W_TEX] * n, axis=1)
            for c in range(3)
        ])
    r = jnp.stack([o[0] for o in outs])
    g = jnp.stack([o[1] for o in outs])
    b = jnp.stack([o[2] for o in outs])
    return r, g, b


def _kernel(tex_ref, iy_ref, ix_ref, out_r, out_g, out_b, *, reps):
    tex = tex_ref[...]
    iy = iy_ref[...]
    ix = ix_ref[...]
    acc_r = jnp.zeros(iy.shape, jnp.float32)
    acc_g = jnp.zeros(iy.shape, jnp.float32)
    acc_b = jnp.zeros(iy.shape, jnp.float32)

    def body(i, acc):
        ar, ag, ab = acc
        # vary the coordinates per rep so the compiler cannot hoist
        iy2 = (iy + i) % H_TEX
        ix2 = (ix + i * 3) % W_TEX
        r, g, b = _fetch_block(tex, iy2, ix2)
        return (ar + r, ag + g, ab + b)

    acc_r, acc_g, acc_b = jax.lax.fori_loop(
        0, reps, body, (acc_r, acc_g, acc_b))
    out_r[...] = acc_r
    out_g[...] = acc_g
    out_b[...] = acc_b


@functools.partial(jax.jit, static_argnames=("n_tiles", "reps",
                                             "interpret"))
def fetch_tiles(tex_rgb, iy, ix, n_tiles=1, reps=1, interpret=False):
    """iy/ix: [n_tiles*8, 128] i32 -> (r, g, b) fetched f32, `reps`
    fetch rounds accumulated (throughput probe)."""
    S = 8
    bspec = pl.BlockSpec((S, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, reps=reps),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), bspec, bspec],
        out_specs=[bspec] * 3,
        out_shape=[jax.ShapeDtypeStruct(iy.shape, jnp.float32)] * 3,
        interpret=interpret,
    )(tex_rgb, iy, ix)


def make_inputs(n_tiles, seed=0):
    rng = np.random.default_rng(seed)
    tex = rng.random((H_TEX, 3 * W_TEX), np.float32)
    iy = rng.integers(0, H_TEX, (n_tiles * 8, 128), dtype=np.int32)
    ix = rng.integers(0, W_TEX, (n_tiles * 8, 128), dtype=np.int32)
    return (jnp.asarray(tex), jnp.asarray(iy), jnp.asarray(ix),
            tex, iy, ix)


def check():
    jax.config.update("jax_platforms", "cpu")
    tex_j, iy_j, ix_j, tex, iy, ix = make_inputs(2)
    r, g, b = fetch_tiles(tex_j, iy_j, ix_j, n_tiles=2, reps=1,
                          interpret=True)
    want_r = tex[iy, ix]
    want_g = tex[iy, W_TEX + ix]
    want_b = tex[iy, 2 * W_TEX + ix]
    ok = (np.array_equal(np.asarray(r), want_r)
          and np.array_equal(np.asarray(g), want_g)
          and np.array_equal(np.asarray(b), want_b))
    print("one-hot VMEM texel fetch parity:", "OK" if ok else "FAIL")
    return ok


def bench():
    """Marginal-rate measurement: every pallas_call through the axon
    tunnel carries ~35 ms fixed dispatch overhead (see the round-4
    leaf-microbench fix), so a single-rep-count timing is overhead-
    dominated. Time two rep counts and report the rate from the
    DIFFERENCE — the fixed cost cancels."""
    n_tiles = 64

    def timed(reps):
        tex_j, iy_j, ix_j, *_ = make_inputs(n_tiles)
        r, g, b = fetch_tiles(tex_j, iy_j, ix_j, n_tiles=n_tiles,
                              reps=reps)
        float(r.mean())  # materialize (async tunnel compile)
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            r, g, b = fetch_tiles(tex_j, iy_j, ix_j, n_tiles=n_tiles,
                                  reps=reps)
            float(r.mean())
            best = min(best, time.perf_counter() - t0)
        return best

    r_lo, r_hi = 64, 512
    t_lo, t_hi = timed(r_lo), timed(r_hi)
    fetches = n_tiles * 8 * 128 * (r_hi - r_lo)
    rate = fetches / (t_hi - t_lo) / 1e9
    print(f"one-hot VMEM texel fetch (marginal, reps {r_lo}->{r_hi}): "
          f"{fetches} rgb texels in {(t_hi - t_lo)*1e3:.2f} ms -> "
          f"{rate:.3f} Gfetch/s "
          f"(XLA flat-pool gather baseline ~0.25 G/s)")
    return rate


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="interpret-mode parity only (CPU-safe)")
    args = ap.parse_args()
    if args.check:
        sys.exit(0 if check() else 1)
    bench()
