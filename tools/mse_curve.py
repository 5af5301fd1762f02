"""MSE-vs-spp curves: coherent vs incoherent sampling at matched budget.

The equal-quality statement behind the round-4/5 mesh headline
(docs/PERFORMANCE.md): coherent path tracing leaves per-pixel marginals
(and therefore per-pixel MSE at matched spp) unchanged — what changes
is the spatial STRUCTURE of the residual noise (row/chunk banding at
low spp, because pixels in one replica unit share bounce directions).
This tool measures both: the MSE-vs-spp curve for each mode against a
high-spp incoherent ground truth, and a low-spp crop pair saved to
docs/renders/ so the banding trade is visible.

Run strictly alone on the TPU:
  python tools/mse_curve.py [scene ...]
Env: MSE_SPP ("8,32,128,512"), MSE_GT_SPP (4096), MSE_W/H (640/480),
     MSE_CROP_SPP (8)
"""
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def render_avg(arrays, meta, camera, cfg, spp_total, seed0, chunk=256):
    """Average over ceil(spp_total/chunk) launches of `chunk` spp each
    (independent seeds; keeps every launch under the tunnel watchdog)."""
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.render import pallas_kernel as pk

    n = max(1, -(-spp_total // chunk))
    spp = min(chunk, spp_total)
    cfg_c = RenderConfig(
        width=cfg.width, height=cfg.height, samples=spp,
        samples_per_pass=spp, aperture=cfg.aperture,
        focal_length=cfg.focal_length)
    acc = None
    for k in range(n):
        img = pk.render_pallas(arrays, meta, camera, cfg_c,
                               seed=seed0 + 7919 * k)
        acc = img if acc is None else acc + img
    return acc / n


def main():
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.scenes import get_scene

    spps = [int(v) for v in os.environ.get(
        "MSE_SPP", "8,32,128,512").split(",")]
    gt_spp = int(os.environ.get("MSE_GT_SPP", "4096"))
    W = int(os.environ.get("MSE_W", "640"))
    H = int(os.environ.get("MSE_H", "480"))
    crop_spp = int(os.environ.get("MSE_CROP_SPP", "8"))

    for scene in (sys.argv[1:] or ["reference", "teapot"]):
        cfg = RenderConfig(width=W, height=H, samples=8, samples_per_pass=8)
        sc = get_scene(scene, cfg)
        arrays, meta = sc.pack()

        import jax

        # ground truth: incoherent, high spp
        os.environ["PT_COHERENT"] = "0"
        jax.clear_caches()
        t0 = time.perf_counter()
        gt = render_avg(arrays, meta, sc.camera, cfg, gt_spp, seed0=999331)
        print(f"# {scene}: GT {gt_spp} spp incoherent in "
              f"{time.perf_counter() - t0:.0f}s mean={gt.mean():.4f}",
              flush=True)

        rows = {}
        for coherent in (1, 0):
            os.environ["PT_COHERENT"] = str(coherent)
            jax.clear_caches()
            for spp in spps:
                img = render_avg(arrays, meta, sc.camera, cfg, spp,
                                 seed0=17)
                mse = float(((img - gt) ** 2).mean())
                rows[(spp, coherent)] = mse
                print(f"{scene} spp={spp:4d} coherent={coherent} "
                      f"MSE={mse:.6f}", flush=True)
                if coherent == 1 and spp == crop_spp:
                    _save_crop(scene, img, "coherent")
            if coherent == 0 and crop_spp in spps:
                pass
        # crop pair: incoherent at crop_spp for the side-by-side
        os.environ["PT_COHERENT"] = "0"
        jax.clear_caches()
        img_i = render_avg(arrays, meta, sc.camera, cfg, crop_spp, seed0=17)
        _save_crop(scene, img_i, "incoherent")
        os.environ.pop("PT_COHERENT", None)

        print(f"\n{scene}: spp  MSE_coherent  MSE_incoherent  ratio")
        for spp in spps:
            c, i = rows[(spp, 1)], rows[(spp, 0)]
            print(f"{scene}: {spp:4d}  {c:.6f}  {i:.6f}  {c / i:.3f}",
                  flush=True)


def _save_crop(scene, img, tag):
    """Center crop (H/2 x W/2) of a low-spp render, x2 nearest upscale,
    PNG'd into docs/renders/ — makes the coherent row-banding visible
    next to the incoherent white noise."""
    from pathtracer_tpu.io.png import write_png

    H, W = img.shape[:2]
    crop = img[H // 4: 3 * H // 4, W // 4: 3 * W // 4]
    crop = np.repeat(np.repeat(crop, 2, axis=0), 2, axis=1)
    out = os.path.join("docs", "renders",
                       f"noise-{scene}-{tag}-lowspp.png")
    write_png(out, crop)
    print(f"# wrote {out}", flush=True)


if __name__ == "__main__":
    main()
