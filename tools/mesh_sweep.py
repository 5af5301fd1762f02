"""Mesh megakernel sweep: leaf_size x tile shape x pixel order.

With BLOCK pixel tiling, smaller packets have genuinely smaller BVH-walk
unions (a 32x32-pixel packet sees a fraction of the tree), which changes
the round-1 conclusion that bigger packets always win (that held for
scanline strips whose unions were saturated regardless of size).

Run strictly alone on the TPU. Device-only timing with materializing
warmup. Usage:
  python tools/mesh_sweep.py [scene ...]
Env: SWEEP_SPP (8), SWEEP_LEAF ("16,32"), SWEEP_TILES ("8x512,8x256,8x128")
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pathtracer_tpu.config import RenderConfig  # noqa: E402
from pathtracer_tpu.render import pallas_kernel as pk  # noqa: E402
from pathtracer_tpu.scene.pack import pack_scene  # noqa: E402
from pathtracer_tpu.scenes import get_scene  # noqa: E402

SPP = int(os.environ.get("SWEEP_SPP", "8"))
W, H = 1280, 960
LEAVES = [int(v) for v in os.environ.get("SWEEP_LEAF", "16,32").split(",")]
TILES = [tuple(int(x) for x in t.split("x"))
         for t in os.environ.get("SWEEP_TILES", "8x512,8x256,8x128").split(",")]
ORDERS = os.environ.get("SWEEP_ORDERS", "block").split(",")
# sample-in-rows packing factors (1 = unpacked round-2 layout)
PACKS = [int(v) for v in os.environ.get("SWEEP_PACK", "1").split(",")]
# packing axis: row (round 3) / chunk (round 4, aligns with PT_SUBPACKET=2)
PACK_AXIS = os.environ.get("SWEEP_PACK_AXIS", "row")

for scene_name in (sys.argv[1:] or ["teapot", "gopher"]):
    for leaf in LEAVES:
        cfg = RenderConfig(width=W, height=H, samples=SPP,
                           samples_per_pass=SPP)
        sc = get_scene(scene_name, cfg)
        arrays, meta = pack_scene(sc.objects, leaf_size=leaf)
        nn = int(np.asarray(arrays.node_bb_min).shape[0])
        cam_vec = jnp.asarray(pk.build_camera_vec(sc.camera))
        obj, nodes, tris = pk.scene_tables_jnp(arrays, meta)
        for (S, L) in TILES:
          for pack in PACKS:
            if SPP % pack or pk.clamp_pack(pack, S, L, PACK_AXIS) != pack:
                continue
            for order in ORDERS:
                xs, ys, _pid = pk.tile_pixel_layout(W, H, S, L,
                                                    order=order,
                                                    spp_pack=pack,
                                                    pack_axis=PACK_AXIS)
                px = jnp.asarray(xs)
                py = jnp.asarray(ys)

                def run(seed):
                    r, _, _ = pk.trace_tiles(
                        jnp.asarray([seed, 0], jnp.int32), cam_vec, obj,
                        nodes, tris, px, py, meta=meta, cfg=cfg, spp=SPP,
                        total_samples=cfg.samples, tile=(S, L),
                        spp_pack=pack, pack_axis=PACK_AXIS)
                    return float(r.mean())

                t0 = time.time()
                m = run(1)
                t_compile = time.time() - t0
                best = 1e30
                for i in range(2):
                    t0 = time.perf_counter()
                    m = run(i + 2)
                    best = min(best, time.perf_counter() - t0)
                # rays/launch scale with rows: pack repeats the image's
                # pixels over pack-fold more slots at spp/pack samples
                # each — samples per launch is unchanged
                ms = W * H * SPP / best / 1e6
                print(f"{scene_name} leaf={leaf:3d} tile=({S:3d},{L:4d}) "
                      f"{order:6s} pack={pack}/{PACK_AXIS} nodes={nn:5d} "
                      f"compile={t_compile:6.1f}s "
                      f"steady={best:6.2f}s {ms:7.2f} Ms/s "
                      f"mean={m * pack / SPP:.5f}", flush=True)
