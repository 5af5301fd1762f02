"""TPU leaf-size sweep for the snapped-SAH BVH (run strictly alone —
the tunnel allows one jax process at a time).

For each (scene, leaf_size): pack, compile the megakernel, then time
steady-state render_pallas at 1280x960 x SPP and report Msamples/s.

Usage: python tools/tpu_leaf_sweep.py [scene ...]   (default teapot gopher)
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from pathtracer_tpu.config import RenderConfig  # noqa: E402
from pathtracer_tpu.render.pallas_kernel import render_pallas  # noqa: E402
from pathtracer_tpu.scene.pack import pack_scene  # noqa: E402
from pathtracer_tpu.scenes import get_scene  # noqa: E402

SPP = 8
W, H = 1280, 960

for scene_name in (sys.argv[1:] or ["teapot", "gopher"]):
    for leaf in (16, 32, 64):
        cfg = RenderConfig(width=W, height=H, samples=SPP,
                           samples_per_pass=SPP)
        sc = get_scene(scene_name, cfg)
        arrays, meta = pack_scene(sc.objects, leaf_size=leaf)
        nn = int(np.asarray(arrays.node_bb_min).shape[0])
        t0 = time.time()
        img = render_pallas(arrays, meta, sc.camera, cfg, seed=1)
        t_compile = time.time() - t0
        best = 1e30
        for _ in range(2):
            t0 = time.time()
            img = render_pallas(arrays, meta, sc.camera, cfg, seed=1)
            best = min(best, time.time() - t0)
        ms = W * H * SPP / best / 1e6
        print(f"{scene_name} leaf={leaf:3d} nodes={nn:5d} "
              f"compile={t_compile:6.1f}s steady={best:6.2f}s "
              f"{ms:7.2f} Msamples/s mean={float(img.mean()):.5f}",
              flush=True)
