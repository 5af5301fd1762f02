"""Benchmark: reference Cornell scene (scenes/reference.go:12) at 1280x960.

Metric: camera samples traced per second (Msamples/s), steady-state
(compile excluded). Baseline of record (BASELINE.md): the reference's best
published wall time, RTX 2080 at 45.43 s for 1280x960 x 2048 spp
= 2.516G samples => 55.4 Msamples/s.

The reference scene runs on the Pallas TPU megakernel
(pathtracer_tpu/render/pallas_kernel.py) — the whole sample x bounce loop
in VMEM, scene in SMEM, on-core PRNG. Set BENCH_BACKEND=wavefront to
measure the jnp wavefront integrator instead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

# honor an explicit platform request (the contract smoke test pins
# JAX_PLATFORMS=cpu): the axon TPU plugin force-resets the env var at
# interpreter start, so only jax.config.update BEFORE backend init
# actually keeps a subprocess off the TPU tunnel (tests/conftest.py has
# the same workaround)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# persistent XLA compile cache (same dir as the CLI): repeat bench runs
# and the full-render record skip most of the minutes-scale remote
# compiles
try:
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/pathtracer_tpu_xla")))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001 — cache is best-effort
    pass

BASELINE_MSPS = 1280 * 960 * 2048 / 45.43 / 1e6  # 55.39 Msamples/s
# per-scene reference baselines (BASELINE.md): best published wall times
# at 1280x960 x 2048 spp on the RTX 2080
SCENE_BASELINES = {
    "reference": BASELINE_MSPS,
    "teapot": 1280 * 960 * 2048 / (29 * 60 + 20) / 1e6,   # 29m20s -> 1.43
    "gopher": 1280 * 960 * 2048 / (47 * 60) / 1e6,        # 47m    -> 0.89
}


def bench_pallas(cfg, sc, arrays, meta, spp):
    import jax.numpy as jnp
    import numpy as np

    from pathtracer_tpu.render import pallas_kernel as pk

    W, H = cfg.width, cfg.height
    # use the same tile the driver uses for this scene kind (mesh scenes
    # want (8, 512) packets; a fixed (64, 256) understated mesh rates)
    tile_env = os.environ.get("BENCH_TILE")
    S, L = (tuple(int(v) for v in tile_env.split("x")) if tile_env
            else pk.default_tile(meta))
    axis = pk.default_pack_axis(meta)
    pack = pk.clamp_pack(pk.default_pack(meta, spp), S, L, axis)
    xs, ys, _pid = pk.tile_pixel_layout(W, H, S, L,
                                        order=pk.default_order(meta),
                                        spp_pack=pack, pack_axis=axis)
    px = jnp.asarray(xs)
    py = jnp.asarray(ys)
    cam_vec = jnp.asarray(pk.build_camera_vec(sc.camera))
    obj, nodes, tris = pk.scene_tables_jnp(
        arrays, meta, traversal=pk.traversal_mode(meta))

    def run(seed, force=False):
        r, _, _ = pk.trace_tiles(
            jnp.asarray([seed, 0], jnp.int32), cam_vec, obj, nodes, tris,
            px, py, meta=meta, cfg=cfg, spp=spp, total_samples=cfg.samples,
            tile=(S, L), spp_pack=pack,
            tex=(arrays.tex_staged if pk.staged_lanes(meta) else None),
        )
        if force:
            # the remote tunnel compiles asynchronously and
            # block_until_ready can return before the compile finishes —
            # the warmup must materialize a value so the timed runs
            # measure steady-state execution only
            float(r.mean())
        else:
            r.block_until_ready()

    run(0, force=True)  # compile + warm
    best = float("inf")
    for i in range(3):  # best-of-3: the remote tunnel adds run-to-run jitter
        t0 = time.perf_counter()
        run(i + 1)
        best = min(best, time.perf_counter() - t0)
    return W * H * spp, best


def bench_diff(cfg, sc, arrays, meta, spp):
    """fwd+bwd (differentiable render + gradient step) throughput — the
    north-star 'fwd+bwd per chip' dimension; the reference has no
    gradients at all. Uses the fused differentiable MEGAKERNEL
    (render/pallas_grad.py) when the scene supports it and a TPU is
    present; BENCH_DIFF_BACKEND=wavefront forces the XLA AD path."""
    import jax

    from pathtracer_tpu.render import pallas_kernel as pk

    staged_ok = (
        # round 5: staged-textured scenes train texels through the
        # fused tex grad kernel (pallas_grad.make_diff_render_tex)
        bool(meta.textured_types)
        and pk.staged_lanes(meta) > 0
        and not meta.has_normal_maps
    )
    use_mk = (
        os.environ.get("BENCH_DIFF_BACKEND", "auto") != "wavefront"
        and jax.devices()[0].platform == "tpu"
        and pk.supports_scene(meta)
        and ((not meta.textured_types and not meta.has_normal_maps)
             or staged_ok)
    )
    if use_mk:
        return bench_diff_megakernel(cfg, sc, arrays, meta, spp,
                                     tex=staged_ok)
    return bench_diff_wavefront(cfg, sc, arrays, meta, spp)


def bench_diff_megakernel(cfg, sc, arrays, meta, spp, tex=False):
    import jax.numpy as jnp
    import numpy as np

    from pathtracer_tpu.diff.grad import (make_megakernel_step,
                                          make_megakernel_step_tex)

    W, H = cfg.width, cfg.height
    step_spp = max(1, min(spp, 32))
    target = None
    color = arrays.color.astype(jnp.float32)
    emission = arrays.emission.astype(jnp.float32)
    if tex:
        step, target_of = make_megakernel_step_tex(
            arrays, meta, cfg, sc.camera, spp=step_spp)
        target = target_of(np.zeros((H, W, 3), np.float32))
        atlas = arrays.tex_staged.astype(jnp.float32)
        c, e, a, loss = step(color, emission, atlas,
                             jnp.asarray([1, 0], jnp.int32), target)
        float(loss)  # true materialization (async tunnel compile)
        n = 3
        t0 = time.perf_counter()
        for i in range(n):
            c, e, a, loss = step(c, e, a,
                                 jnp.asarray([i + 2, 0], jnp.int32),
                                 target)
        float(loss)
        return W * H * step_spp * n, time.perf_counter() - t0

    step, target_of = make_megakernel_step(
        arrays, meta, cfg, sc.camera, spp=step_spp)
    target = target_of(np.zeros((H, W, 3), np.float32))

    c, e, loss = step(color, emission, jnp.asarray([1, 0], jnp.int32),
                      target)
    float(loss)  # true materialization (async tunnel compile)
    n = 3
    t0 = time.perf_counter()
    for i in range(n):
        c, e, loss = step(c, e, jnp.asarray([i + 2, 0], jnp.int32),
                          target)
    float(loss)
    return W * H * step_spp * n, time.perf_counter() - t0


def bench_diff_wavefront(cfg, sc, arrays, meta, spp):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtracer_tpu.diff.grad import extract_params, train_step
    from pathtracer_tpu.render.vec3 import Vec3

    W, H = cfg.width, cfg.height
    cam = sc.camera.pack()
    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.ravel(), jnp.int32)
    py = jnp.asarray(ys.ravel(), jnp.int32)
    params = extract_params(arrays)
    target = Vec3.zeros((px.shape[0],), jnp.float32)
    key = jax.random.PRNGKey(0)
    n = max(1, spp // 8)  # gradient steps at 1 spp each

    step = jax.jit(lambda p: train_step(
        p, arrays, meta, cfg, cam, px, py, key, 1, target))
    p2, _ = step(params)
    float(jax.tree.leaves(p2)[0].ravel()[0])  # true materialization
    t0 = time.perf_counter()
    for _ in range(n):
        p2, _ = step(p2)
    jax.tree.leaves(p2)[0].block_until_ready()
    return W * H * n, time.perf_counter() - t0


def bench_wavefront(cfg, sc, arrays, meta, spp):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtracer_tpu.render.integrator import _render_tile_jit

    W, H = cfg.width, cfg.height
    spp_chunk = min(cfg.samples_per_pass, spp)
    cfg = cfg.replace(samples_per_pass=spp_chunk)
    n_chunks = max(1, spp // spp_chunk)
    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.ravel(), jnp.int32)
    py = jnp.asarray(ys.ravel(), jnp.int32)

    # warmup MUST use the same static n_chunks as the timed call, and
    # must MATERIALIZE a value: block_until_ready can return before the
    # tunnel's asynchronous compile finishes
    out = _render_tile_jit(arrays, meta, cfg, sc.camera.pack(), px, py,
                           n_chunks, jax.random.PRNGKey(0))
    float(out.x.mean())
    best = float("inf")
    for i in range(2):
        t0 = time.perf_counter()
        out = _render_tile_jit(arrays, meta, cfg, sc.camera.pack(), px, py,
                               n_chunks, jax.random.PRNGKey(i + 1))
        out.x.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return W * H * n_chunks * spp_chunk, best


def _clear_backends():
    """Drop jax's cached backend state so a retry re-attempts tunnel
    init (a failed init is cached for the life of the process
    otherwise)."""
    try:
        import jax.extend as jex

        jex.backend.clear_backends()
    except Exception:  # noqa: BLE001 — best effort; retry anyway
        pass


def _recoverable_retry(fn, attempts=None, wait_s=None):
    """Run ``fn()``; on device/tunnel errors (UNAVAILABLE, worker crash,
    DEADLINE — the axon tunnel wedges ~2-5 min after any crash,
    including one from a PREVIOUS process) clear backends, wait out the
    wedge window, and retry. Deterministic failures raise immediately.

    BENCH_r02 lesson: backend init + scene pack() sat OUTSIDE the retry,
    so one wedged-chip window zeroed the whole round's perf record —
    everything device-touching must go through here.
    """
    from pathtracer_tpu.driver import _is_recoverable

    if attempts is None:
        attempts = int(os.environ.get("BENCH_RETRIES", "3"))
    if wait_s is None:
        wait_s = float(os.environ.get("PT_RECOVER_WAIT_S", "150"))
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered below
            if not _is_recoverable(e) or i == attempts - 1:
                raise
            print(f"# recoverable device error (attempt {i + 1}/"
                  f"{attempts}), retrying in {wait_s:.0f}s: "
                  f"{type(e).__name__}", flush=True)
            _clear_backends()
            time.sleep(wait_s)


def _measure(fn, cfg, sc, arrays, meta, spp):
    samples, dt = fn(cfg, sc, arrays, meta, spp)
    return samples / dt / 1e6


def _extra_records(width, height):
    """Secondary metrics for the round record (VERDICT r1 #8): mesh-scene
    forward rates and the fwd+bwd differentiable rate, attached to the
    headline JSON line under "extra". TPU-only; each is individually
    fault-isolated. BENCH_EXTRA=0 skips."""
    import jax

    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.scenes import get_scene

    if os.environ.get("BENCH_EXTRA", "1") == "0":
        return {}
    if jax.devices()[0].platform != "tpu":
        return {}
    # the remote-compile service has minutes-scale latency variance per
    # kernel; cap total extras time so the headline JSON line always
    # prints within the driver's budget even on a bad compile day
    budget_s = float(os.environ.get("BENCH_EXTRA_BUDGET_S", "2700"))
    t_start = time.time()
    out = {}
    for scene, fn, spp in (("teapot", bench_pallas, 8),
                           ("gopher", bench_pallas, 8),
                           # textured scenes ride the megakernel now
                           # (computed texels, render/proctex.py)
                           ("textures", bench_pallas, 32),
                           # file-backed images: VMEM-staged in-kernel
                           # fetch (pack._stage_file_textures)
                           ("textures-file", bench_pallas, 32),
                           ("cubemap", bench_pallas, 8),
                           # round 5: mip-staged large file sky texture
                           ("envmap-file", bench_pallas, 32),
                           ("reference", bench_diff, 32),
                           # round 5: texel gradients on the fast path
                           # (textures-file minus normal maps — the
                           # texture-recovery training configuration)
                           ("textures-train", bench_diff, 32)):
        tag = (f"fwd_bwd_{scene}" if fn is bench_diff
               else f"fwd_{scene}")
        if time.time() - t_start > budget_s:
            out[tag] = {"skipped": "extras time budget exhausted"}
            continue
        try:
            def one_record(scene=scene, fn=fn, spp=spp):
                # scene pack() is the first device_put — it must sit
                # inside the retry (BENCH_r02 died exactly there)
                cfg = RenderConfig(width=width, height=height,
                                   samples=2048, samples_per_pass=8)
                sc = get_scene(scene, cfg)
                arrays, meta = sc.pack()
                return _measure(fn, cfg, sc, arrays, meta, spp)

            msps = _recoverable_retry(one_record, attempts=2)
            rec = {"Msamples_per_sec": round(msps, 3)}
            if scene in SCENE_BASELINES and fn is bench_pallas:
                rec["vs_baseline"] = round(
                    msps / SCENE_BASELINES[scene], 4)
            out[tag] = rec
        except Exception as e:  # noqa: BLE001 — record the miss, move on
            out[tag] = {"error": f"{type(e).__name__}"[:60]}
    return out


def _full_render_record(width, height):
    """End-to-end wall clock of the FULL headline render (reference
    scene, width x height x 2048 spp) through the production driver —
    scene build + segmented device render + host download included.
    This is the number the reference's published 45.43 s actually is
    (VERDICT r4 ask #7). Two runs: the first pays whatever compile the
    persistent cache doesn't cover, the second is the warm number."""
    import jax

    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.driver import render_driver
    from pathtracer_tpu.scenes import get_scene

    if (os.environ.get("BENCH_EXTRA", "1") == "0"
            or jax.devices()[0].platform != "tpu"):
        return {}

    def one(tag_unused):
        t0 = time.perf_counter()
        cfg = RenderConfig(width=width, height=height, samples=2048,
                           samples_per_pass=8)
        sc = get_scene("reference", cfg)
        arrays, meta = sc.pack()
        img, stats = render_driver(arrays, meta, sc.camera, cfg)
        wall = time.perf_counter() - t0
        assert float(img.mean()) > 0.0
        return wall, stats

    try:
        wall_cold, _ = _recoverable_retry(lambda: one("cold"),
                                          attempts=2)
        wall_warm, stats = _recoverable_retry(lambda: one("warm"),
                                              attempts=2)
        total = width * height * 2048
        return {"full_render_1280x960x2048": {
            "wall_s": round(wall_warm, 2),
            "wall_s_first_run": round(wall_cold, 2),
            "Msamples_per_sec_e2e": round(total / wall_warm / 1e6, 1),
            "vs_baseline_wall": round(45.43 / wall_warm, 2),
            "device_Msamples_per_sec": round(
                getattr(stats, "msamples_per_sec", 0.0), 1),
        }}
    except Exception as e:  # noqa: BLE001 — never sink the headline
        return {"full_render_1280x960x2048": {
            "error": f"{type(e).__name__}"[:60]}}


def main():
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.scenes import get_scene

    width = int(os.environ.get("BENCH_WIDTH", "1280"))
    height = int(os.environ.get("BENCH_HEIGHT", "960"))
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    # 128-spp launches amortize per-launch overhead best (same config the
    # driver uses for full renders); 64 measured ~9% lower
    spp = int(os.environ.get("BENCH_SPP", "128" if backend == "pallas"
                             else "32"))

    scene = os.environ.get("BENCH_SCENE", "reference")
    fn = {"pallas": bench_pallas, "wavefront": bench_wavefront,
          "diff": bench_diff}[backend]
    tag = "_fwd_bwd" if backend == "diff" else ""
    metric = f"{scene}{tag}_{width}x{height}_Msamples_per_sec"

    def headline():
        # EVERYTHING device-touching lives inside the retry: backend
        # init happens at the first jnp.asarray inside pack()
        cfg = RenderConfig(width=width, height=height, samples=2048,
                           samples_per_pass=8)
        sc = get_scene(scene, cfg)
        arrays, meta = sc.pack()
        return _measure(fn, cfg, sc, arrays, meta, spp)

    try:
        msps = _recoverable_retry(headline)
    except Exception as e:  # noqa: BLE001 — still print a parseable line
        # a dead tunnel must not zero the round record entirely: emit
        # the headline JSON with the failure recorded, nonzero rc
        print(json.dumps({
            "metric": metric, "value": None, "unit": "Msamples/s",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}"[:200],
        }))
        raise SystemExit(1)

    rec = {
        "metric": metric,
        "value": round(msps, 3),
        "unit": "Msamples/s",
        "vs_baseline": round(
            msps / SCENE_BASELINES.get(scene, BASELINE_MSPS), 4),
    }
    try:
        extra = _extra_records(width, height)
    except Exception as e:  # noqa: BLE001 — extras never sink the headline
        extra = {"error": f"{type(e).__name__}"[:60]}
    if scene == "reference" and backend == "pallas":
        extra.update(_full_render_record(width, height))
    if extra:
        rec["extra"] = extra
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
