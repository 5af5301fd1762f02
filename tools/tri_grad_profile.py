"""Where do per-triangle gradient steps spend their time?

Round-4 record: 2.2 Ms/s fwd+bwd on teapot (640x480x8spp steps) vs
288 Ms/s for the object-color diff path — pinned on "the HBM (slot,
dS/dc) tape + XLA segment-sum" (docs/PERFORMANCE.md). Before
restructuring (VERDICT r4 ask #6), measure which part actually
dominates:

  fwd          forward megakernel only
  bwd_obj      grad_tiles tri_grads=False (replay + obj accumulators)
  bwd_tape     grad_tiles tri_grads=True, tape materialized, NO
               segment-sum (sum the raw tape instead)
  bwd_full     tri path incl. segment-sum scatter-add

Run strictly alone on the TPU:
  python tools/tri_grad_profile.py [scene] (default teapot)
Env: TP_SPP (4), TP_W/TP_H (640/480)
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pathtracer_tpu.config import RenderConfig  # noqa: E402
from pathtracer_tpu.render import pallas_kernel as pk  # noqa: E402
from pathtracer_tpu.render import pallas_grad as pg  # noqa: E402
from pathtracer_tpu.scenes import get_scene  # noqa: E402

W = int(os.environ.get("TP_W", "640"))
H = int(os.environ.get("TP_H", "480"))
SPP = int(os.environ.get("TP_SPP", "4"))
TILE = (8, 512)


def timed(label, fn, n=3):
    fn(1)  # compile + warm (materializes)
    best = 1e30
    for i in range(n):
        t0 = time.perf_counter()
        fn(i + 2)
        best = min(best, time.perf_counter() - t0)
    msps = W * H * SPP / best / 1e6
    print(f"{label:10s} {best * 1e3:9.1f} ms  {msps:8.2f} Ms/s",
          flush=True)
    return best


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "teapot"
    cfg = RenderConfig(width=W, height=H, samples=SPP,
                       samples_per_pass=SPP)
    sc = get_scene(scene, cfg)
    arrays, meta = sc.pack()
    assert meta.has_groups
    S, L = TILE
    xs, ys, pid = pk.tile_pixel_layout(W, H, S, L, order="block")
    px = jnp.asarray(xs)
    py = jnp.asarray(ys)
    cam_vec = jnp.asarray(pk.build_camera_vec(sc.camera))
    obj, nodes, tris = pk.scene_tables_jnp(arrays, meta,
                                           traversal="classic")
    cot = jnp.ones(px.shape, jnp.float32)
    import dataclasses

    meta_nd = dataclasses.replace(meta, tri_uniform_color=None)

    def fwd(seed):
        r, _, _ = pk.trace_tiles(
            jnp.asarray([seed, 0], jnp.int32), cam_vec, obj, nodes,
            tris, px, py, meta=meta_nd, cfg=cfg, spp=SPP,
            total_samples=cfg.samples, tile=TILE)
        float(r.mean())

    def bwd_obj(seed):
        gc, ge = pg.grad_tiles(
            jnp.asarray([seed, 0], jnp.int32), cam_vec, obj, nodes,
            tris, px, py, cot, cot, cot, meta=meta_nd, cfg=cfg, spp=SPP,
            total_samples=cfg.samples, tile=TILE)
        float(gc.sum())

    def make_bwd_tri(mode):
        @jax.jit
        def _f(seed):
            outs = pg.grad_tiles(
                seed, cam_vec, obj, nodes, tris, px, py, cot, cot, cot,
                meta=meta_nd, cfg=cfg, spp=SPP,
                total_samples=cfg.samples, tile=TILE, tri_grads=True,
                tri_mode=mode)
            return outs[2].sum()

        def bwd(seed):
            float(_f(jnp.asarray([seed, 0], jnp.int32)))
        return bwd

    t_fwd = timed("fwd", fwd)
    t_obj = timed("bwd_obj", bwd_obj)
    t_tape = timed("tri_tape", make_bwd_tri("tape"))
    t_oh = timed("tri_onehot", make_bwd_tri("onehot"))
    for name, t_b in (("tape", t_tape), ("onehot", t_oh)):
        r = W * H * SPP / (t_fwd + t_b) / 1e6
        print(f"# fwd+bwd ({name}): {r:.2f} Ms/s", flush=True)


if __name__ == "__main__":
    main()
