"""TPU leaf-size sweep for the snapped-SAH BVH (run strictly alone —
the tunnel allows one jax process at a time).

For each (scene, leaf_size): pack, compile the megakernel, then time
steady-state DEVICE execution at 1280x960 x SPP and report Msamples/s.
Timing notes (learned the hard way, docs/PERFORMANCE.md):
- time trace_tiles with a device-side mean + scalar get, NOT
  render_pallas (whose full-image numpy conversion rides the ~8.5 MB/s
  tunnel downlink and swamps kernel-time differences)
- the warmup must MATERIALIZE a value; block_until_ready can return
  before the tunnel's asynchronous compile finishes

Usage: python tools/tpu_leaf_sweep.py [scene ...]   (default teapot gopher)
"""
import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pathtracer_tpu.config import RenderConfig  # noqa: E402
from pathtracer_tpu.render import pallas_kernel as pk  # noqa: E402
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
        S, L = pk.default_tile(meta)
        xs, ys, _pid = pk.tile_pixel_layout(W, H, S, L,
                                            order=pk.default_order(meta))
        px = jnp.asarray(xs)
        py = jnp.asarray(ys)
        cam_vec = jnp.asarray(pk.build_camera_vec(sc.camera))
        obj, nodes, tris = pk.scene_tables_jnp(arrays, meta)

        def run(seed):
            r, _, _ = pk.trace_tiles(
                jnp.asarray([seed, 0], jnp.int32), cam_vec, obj, nodes,
                tris, px, py, meta=meta, cfg=cfg, spp=SPP,
                total_samples=cfg.samples, tile=(S, L))
            return float(r.mean())

        t0 = time.time()
        m = run(1)
        t_compile = time.time() - t0
        best = 1e30
        for i in range(2):
            t0 = time.perf_counter()
            m = run(i + 2)
            best = min(best, time.perf_counter() - t0)
        ms = W * H * SPP / best / 1e6
        print(f"{scene_name} leaf={leaf:3d} nodes={nn:5d} "
              f"compile={t_compile:6.1f}s steady={best:6.2f}s "
              f"{ms:7.2f} Msamples/s mean={m / SPP:.5f}",
              flush=True)
