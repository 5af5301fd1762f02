"""Per-pixel variance-equality check for coherent path tracing.

The coherent-sampling claim (docs/PERFORMANCE.md round 4; the mesh-scene
headline depends on it): sharing roulette / hemisphere / light uniforms
across a sublane row (pack_axis=row) or 128-lane chunk group
(pack_axis=chunk) leaves every pixel's PER-PIXEL variance unchanged —
only cross-pixel correlation changes — PROVIDED the replica bookkeeping
is exact, i.e. distinct samples of one pixel never share a draw. A
replica-mapping bug (row/chunk mapped to the wrong sample replica)
would correlate samples of the SAME pixel and inflate per-pixel
variance by up to spp_pack x, with no mean-level test failing.

This harness measures that directly: K independent seeds of the
`default` scene (3-triangle group -> packet BVH + all primitive types)
per mode, per-pixel empirical variance across seeds, and the
variance-field ratio coherent/incoherent for every
(pack_axis, spp_pack) combination. Under the null every ratio ~= 1
within sampling error (rel std of a mean-of-768-pixel-variances at
K seeds is a few %); a mapping bug shows up as a ratio >> 1.

Runs on CPU (interpret mode, software PRNG — the same draw-sharing
code paths as hardware; seeds vary without retracing). The slow-profile
test tests/test_sampling.py::test_coherent_variance_parity runs a
slimmed version of this matrix; this tool prints the full table for
docs/PERFORMANCE.md.

Usage: JAX_PLATFORMS=cpu python tools/variance_check.py [--seeds K]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU-only tool. NOTE: the axon TPU plugin FORCE-SETS JAX_PLATFORMS=axon
# at interpreter startup, so a setdefault would silently attach this
# "CPU" job to the TPU tunnel and crash any concurrent TPU run — pin
# cpu unconditionally (tests/conftest.py has the same workaround)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def render_matrix(scene="default", width=32, height=24, spp=8, seeds=64,
                  configs=None):
    """Returns {(axis, pack, coherent): stacked [K, H, W, 3] images}."""
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.render import pallas_kernel as pk
    from pathtracer_tpu.scenes import get_scene

    cfg = RenderConfig(width=width, height=height, samples=spp,
                       samples_per_pass=spp)
    sc = get_scene(scene, cfg)
    arrays, meta = sc.pack()
    assert pk.supports_scene(meta)

    if configs is None:
        configs = [("row", 1), ("row", 8), ("chunk", 1), ("chunk", 8)]

    out = {}
    for axis, pack in configs:
        # chunk pack=8 needs L with 128-lane-aligned replica groups
        tile = (8, 1024) if axis == "chunk" else (64, 256)
        for coherent in (1, 0):
            os.environ["PT_PACK_AXIS"] = axis
            os.environ["PT_SPP_PACK"] = str(pack)
            os.environ["PT_COHERENT"] = str(coherent)
            jax.clear_caches()  # knobs are read at kernel-trace time
            imgs = []
            t0 = time.perf_counter()
            for k in range(seeds):
                imgs.append(pk.render_pallas(
                    arrays, meta, sc.camera, cfg, seed=1000 + 7 * k,
                    interpret=True, tile=tile))
            out[(axis, pack, coherent)] = np.stack(imgs)
            print(f"  axis={axis} pack={pack} coherent={coherent}: "
                  f"{seeds} seeds in {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
    for v in ("PT_PACK_AXIS", "PT_SPP_PACK", "PT_COHERENT"):
        os.environ.pop(v, None)
    jax.clear_caches()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=64)
    ap.add_argument("--scene", default="default")
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--height", type=int, default=24)
    args = ap.parse_args()

    mats = render_matrix(scene=args.scene, width=args.width,
                         height=args.height, spp=args.spp,
                         seeds=args.seeds)

    print(f"\nscene={args.scene} {args.width}x{args.height} "
          f"spp={args.spp} K={args.seeds} seeds")
    print(f"{'axis':<6} {'pack':<5} {'mean MAD c-i':<13} "
          f"{'var ratio c/i':<14} {'rel stderr':<11} verdict")
    ok_all = True
    for axis, pack in [("row", 1), ("row", 8), ("chunk", 1), ("chunk", 8)]:
        c = mats[(axis, pack, 1)]
        i = mats[(axis, pack, 0)]
        K = c.shape[0]
        mean_mad = np.abs(c.mean(0) - i.mean(0)).mean()
        var_c = c.var(0, ddof=1).mean()
        var_i = i.var(0, ddof=1).mean()
        ratio = var_c / var_i
        # rel std of a single pixel's variance estimate ~ sqrt(2/(K-1));
        # pixels within a coherent row share draws, so the effective
        # number of independent variance estimates is ~n_row_groups x
        # n_pixel_rows, bounded below by the pixel-row count. Quote the
        # conservative bound.
        n_eff = c.shape[1]  # pixel rows: independent across rows
        rel_se = np.sqrt(2.0 / (K - 1) / n_eff)
        ok = abs(ratio - 1.0) < max(6 * rel_se, 0.10)
        ok_all &= ok
        print(f"{axis:<6} {pack:<5} {mean_mad:<13.4f} {ratio:<14.3f} "
              f"{rel_se:<11.3f} {'OK' if ok else 'FAIL'}")
    print("\nPASS: per-pixel variance parity holds for every "
          "(pack_axis, spp_pack) mode" if ok_all else
          "\nFAIL: coherent sampling inflates per-pixel variance — "
          "replica bookkeeping bug")
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
