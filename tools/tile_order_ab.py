"""A/B: block vs linear pixel->tile assignment for the megakernel.

Device-only timing with materializing warmup (tunnel compiles async);
run strictly alone on the TPU.
"""
import os
import sys
import time

import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render import pallas_kernel as pk
from pathtracer_tpu.scenes import get_scene

W = int(os.environ.get("AB_W", "1280"))
H = int(os.environ.get("AB_H", "960"))
SPP = int(os.environ.get("AB_SPP", "8"))

for scene_name in (sys.argv[1:] or ["teapot", "reference"]):
    cfg = RenderConfig(width=W, height=H, samples=SPP, samples_per_pass=SPP)
    sc = get_scene(scene_name, cfg)
    arrays, meta = sc.pack()
    S, L = pk.default_tile(meta)
    cam_vec = jnp.asarray(pk.build_camera_vec(sc.camera))
    obj, nodes, tris = pk.scene_tables_jnp(arrays, meta)
    for order in ("linear", "block"):
        xs, ys, pid = pk.tile_pixel_layout(W, H, S, L, order=order)
        px = jnp.asarray(xs)
        py = jnp.asarray(ys)

        def run(seed):
            r, g, b = pk.trace_tiles(
                jnp.asarray([seed, 0], jnp.int32), cam_vec, obj, nodes,
                tris, px, py, meta=meta, cfg=cfg, spp=SPP,
                total_samples=cfg.samples, tile=(S, L))
            return float(r.mean()), r

        t0 = time.time()
        m, _ = run(1)
        t_compile = time.time() - t0
        best = 1e30
        for i in range(2):
            t0 = time.perf_counter()
            m, _ = run(i + 2)
            best = min(best, time.perf_counter() - t0)
        ms = W * H * SPP / best / 1e6
        # weighted mean over valid slots for parity checking
        print(f"{scene_name} {order:6s} tile=({S},{L}) "
              f"compile={t_compile:6.1f}s steady={best:6.2f}s "
              f"{ms:8.2f} Ms/s rawmean={m:.6f}", flush=True)
