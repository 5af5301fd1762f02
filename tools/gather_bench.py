"""TPU gather-strategy microbench for the texel fetch (run strictly
alone — the tunnel allows one jax process at a time).

The wavefront textured path spends ~97% of its time in 4 flat-pool
`jnp.take` gathers per bounce (docs/PERFORMANCE.md). This measures the
per-index cost of every plausible TPU lowering so the fetch design is
picked from data, not folklore:

  take1x4   four independent 1-D takes (the current bilinear fetch)
  quad      ONE take from a [T,4] row pool (bilinear quad precomputed at
            pack time: texel, right-wrap, down-wrap, diag-wrap)
  quad8     same but rows padded to 8 (sublane-aligned)
  rowlane   pool as [T/128,128]; take rows by idx>>7, then one-hot lane
            select on the VPU (tests whether ROW gathers vectorize)
  take2d    [H,W] advanced indexing (known-bad round-1 result, kept as a
            control)
  sorted    take1x4 with sorted indices (coherence sensitivity)

Each timing loops the op K times inside one jit (index-perturbed to
defeat CSE) and materializes one scalar, so tunnel latency amortizes.

Usage: python tools/gather_bench.py [R] [T]   (default 1228800 262144)
"""
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

R = int(sys.argv[1]) if len(sys.argv) > 1 else 1280 * 960
T = int(sys.argv[2]) if len(sys.argv) > 2 else 512 * 512
K = 8  # in-jit repetitions per timing

rng = np.random.default_rng(0)
idx_np = rng.integers(0, T, size=R).astype(np.int32)
pool_np = rng.integers(0, 2**24, size=T, dtype=np.uint32)

W = 512  # synthetic texture width for the quad layout
pool4_np = np.stack([
    pool_np,
    np.roll(pool_np, -1),
    np.roll(pool_np, -W),
    np.roll(pool_np, -W - 1),
], axis=1)  # [T,4]
pool8_np = np.concatenate([pool4_np, pool4_np], axis=1)  # [T,8]
pool2d_np = pool_np.reshape(T // 128, 128)
poolhw_np = pool_np.reshape(T // W, W)

dev_idx = jax.device_put(jnp.asarray(idx_np))
dev_idx_sorted = jax.device_put(jnp.asarray(np.sort(idx_np)))
dev_pool = jax.device_put(jnp.asarray(pool_np))
dev_pool4 = jax.device_put(jnp.asarray(pool4_np))
dev_pool8 = jax.device_put(jnp.asarray(pool8_np))
dev_pool2d = jax.device_put(jnp.asarray(pool2d_np))
dev_poolhw = jax.device_put(jnp.asarray(poolhw_np))

LANES = jnp.arange(128, dtype=jnp.int32)


def body_take1x4(pool, idx):
    # four takes with distinct (perturbed) index vectors, like bilinear
    acc = jnp.uint32(0)
    for j in range(4):
        acc = acc + jnp.take(pool, (idx + j) % T, mode="clip").sum()
    return acc


def body_quad(pool4, idx):
    return jnp.take(pool4, idx, axis=0, mode="clip").sum()


def body_quad8(pool8, idx):
    return jnp.take(pool8, idx, axis=0, mode="clip").sum()


def body_rowlane(pool2d, idx):
    rows = jnp.take(pool2d, idx >> 7, axis=0, mode="clip")  # [R,128]
    onehot = (LANES[None, :] == (idx & 127)[:, None])
    return jnp.where(onehot, rows, jnp.uint32(0)).sum()


def body_take2d(poolhw, idx):
    return poolhw[idx // W, idx % W].sum()


def timed(name, body, pool, idx):
    @jax.jit
    def run(pool, idx, seed):
        def step(i, acc):
            return acc + body(pool, (idx + i + seed) % T)
        return jax.lax.fori_loop(0, K, step, jnp.uint32(0))

    t0 = time.time()
    float(run(pool, idx, 1))
    t_compile = time.time() - t0
    best = 1e30
    for s in range(2, 4):
        t0 = time.perf_counter()
        float(run(pool, idx, s))
        best = min(best, time.perf_counter() - t0)
    per = best / K
    gps = R / per / 1e9
    print(f"{name:10s} compile={t_compile:6.1f}s  {per * 1e3:8.3f} ms/op "
          f" {gps:7.3f} G idx/s", flush=True)
    return per


print(f"R={R} indices, pool T={T} texels "
      f"({jax.devices()[0].platform})", flush=True)
base = timed("take1x4", body_take1x4, dev_pool, dev_idx)
timed("quad", body_quad, dev_pool4, dev_idx)
timed("quad8", body_quad8, dev_pool8, dev_idx)
timed("rowlane", body_rowlane, dev_pool2d, dev_idx)
timed("take2d", body_take2d, dev_poolhw, dev_idx)
timed("sorted1x4", body_take1x4, dev_pool, dev_idx_sorted)
