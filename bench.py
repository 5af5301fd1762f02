"""Benchmark: reference Cornell scene (scenes/reference.go:12) at 1280x960.

Metric: camera samples traced per second (Msamples/s), steady-state
(compile excluded). Baseline of record (BASELINE.md): the reference's best
published wall time, RTX 2080 at 45.43 s for 1280x960 x 2048 spp
= 2.516G samples => 55.4 Msamples/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

BASELINE_MSPS = 1280 * 960 * 2048 / 45.43 / 1e6  # 55.39 Msamples/s


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.render.camera import Camera
    from pathtracer_tpu.render.integrator import _render_tile_jit
    from pathtracer_tpu.scene.pack import pack_scene
    from pathtracer_tpu.scenes import get_scene

    width, height = 1280, 960
    bench_spp = int(os.environ.get("BENCH_SPP", "32"))
    spp_chunk = 8

    cfg = RenderConfig(width=width, height=height, samples=2048,
                       samples_per_pass=spp_chunk)
    sc = get_scene("reference", cfg)
    arrays, meta = pack_scene(sc.objects)
    cam = sc.camera.pack()

    ys, xs = np.mgrid[0:height, 0:width]
    px = jnp.asarray(xs.ravel(), jnp.int32)
    py = jnp.asarray(ys.ravel(), jnp.int32)
    n_chunks = bench_spp // spp_chunk
    key = jax.random.PRNGKey(0)

    # warmup / compile
    out = _render_tile_jit(arrays, meta, cfg, cam, px, py, 1, key)
    out.x.block_until_ready()

    t0 = time.perf_counter()
    out = _render_tile_jit(arrays, meta, cfg, cam, px, py, n_chunks, key)
    out.x.block_until_ready()
    dt = time.perf_counter() - t0

    samples = width * height * n_chunks * spp_chunk
    msps = samples / dt / 1e6
    print(json.dumps({
        "metric": "reference_1280x960_Msamples_per_sec",
        "value": round(msps, 3),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / BASELINE_MSPS, 4),
    }))


if __name__ == "__main__":
    main()
