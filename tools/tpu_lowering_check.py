"""Lower the Pallas megakernel for the TPU platform WITHOUT hardware.

``jax.export`` performs platform-targeted lowering, which for pallas_call
includes the Pallas->Mosaic MLIR lowering where most "unsupported on TPU"
rejections surface (bool vector selects, missing casts, unsupported
gathers, bad dot shapes). Running this on CPU therefore smoke-tests a new
traversal/kernel variant's TPU-compilability before burning tunnel time —
it cannot catch Mosaic's own register-allocation/layout failures (those
happen inside XLA), but it catches the lowering class that bit round 1.

Usage:  python tools/tpu_lowering_check.py [scene ...]
  PT_TRAVERSAL=mxu python tools/tpu_lowering_check.py teapot
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # never touch the tunnel

import jax.numpy as jnp  # noqa: E402

from pathtracer_tpu.config import RenderConfig  # noqa: E402
from pathtracer_tpu.render import pallas_kernel as pk  # noqa: E402
from pathtracer_tpu.scenes import get_scene  # noqa: E402


def check(scene: str) -> bool:
    cfg = RenderConfig(width=64, height=48, samples=8, samples_per_pass=8)
    sc = get_scene(scene, cfg)
    arrays, meta = sc.pack()
    if not pk.supports_scene(meta):
        print(f"[{scene}] SKIP: megakernel does not cover this scene")
        return True
    S, L = pk.default_tile(meta)
    xs, ys, _pid = pk.tile_pixel_layout(cfg.width, cfg.height, S, L,
                                        order=pk.default_order(meta))
    obj, nodes, tris = pk.scene_tables_jnp(
        arrays, meta, traversal=pk.traversal_mode(meta))
    cam = jnp.asarray(pk.build_camera_vec(sc.camera))
    tex = arrays.tex_staged if pk.staged_lanes(meta) else None

    def fn(seed, cam, obj, nodes, tris, px, py):
        r, g, b = pk.trace_tiles(seed, cam, obj, nodes, tris, px, py,
                                 meta=meta, cfg=cfg, spp=8,
                                 total_samples=cfg.samples, tile=(S, L),
                                 tex=tex)
        return r + g + b

    args = (jnp.asarray([0, 0], jnp.int32), cam, obj, nodes, tris,
            jnp.asarray(xs), jnp.asarray(ys))
    mode = pk.traversal_mode(meta)
    ok = True
    try:
        exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
        n = len(exp.mlir_module())
        print(f"[{scene}] trace_tiles traversal={mode} tile=({S},{L}) "
              f"TPU lowering OK ({n} bytes of StableHLO)")
    except Exception as e:  # noqa: BLE001 — report and continue
        msg = str(e).splitlines()[0][:300]
        print(f"[{scene}] trace_tiles traversal={mode} TPU lowering "
              f"FAILED: {type(e).__name__}: {msg}")
        ok = False

    # the intersect-only kernel (wavefront path's BVH walk) shares the
    # traversal machinery but has its own pallas_call + outputs
    def ifn(obj, nodes, tris, *rays):
        outs = pk.intersect_tiles(obj, nodes, tris, *rays,
                                  meta=meta, cfg=cfg, tile=(S, L))
        return outs[0]

    z = jnp.zeros((S * 2, L), jnp.float32)
    try:
        exp = jax.export.export(jax.jit(ifn), platforms=["tpu"])(
            obj, nodes, tris, z, z, z, z, z, z)
        n = len(exp.mlir_module())
        print(f"[{scene}] intersect_tiles traversal={mode} "
              f"TPU lowering OK ({n} bytes of StableHLO)")
    except Exception as e:  # noqa: BLE001 — report and continue
        msg = str(e).splitlines()[0][:300]
        print(f"[{scene}] intersect_tiles traversal={mode} TPU lowering "
              f"FAILED: {type(e).__name__}: {msg}")
        ok = False
    return ok


def check_nee(scene: str) -> bool:
    """Lower the megakernel with in-kernel NEE (per-light shadow
    traversal; exercises _acos/sin/cos + the extra unrolled intersect)."""
    cfg = RenderConfig(width=64, height=48, samples=8, samples_per_pass=8,
                       nee=True)
    sc = get_scene(scene, cfg)
    arrays, meta = sc.pack()
    if not pk.supports_scene(meta) or not meta.light_indices:
        print(f"[{scene}] NEE SKIP")
        return True
    S, L = pk.default_tile(meta)
    xs, ys, _pid = pk.tile_pixel_layout(cfg.width, cfg.height, S, L,
                                        order=pk.default_order(meta))
    obj, nodes, tris = pk.scene_tables_jnp(
        arrays, meta, traversal=pk.traversal_mode(meta))
    cam = jnp.asarray(pk.build_camera_vec(sc.camera))

    def fn(seed, cam, obj, nodes, tris, px, py):
        r, g, b = pk.trace_tiles(seed, cam, obj, nodes, tris, px, py,
                                 meta=meta, cfg=cfg, spp=8,
                                 total_samples=cfg.samples, tile=(S, L))
        return r + g + b

    args = (jnp.asarray([0, 0], jnp.int32), cam, obj, nodes, tris,
            jnp.asarray(xs), jnp.asarray(ys))
    try:
        exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
        print(f"[{scene}] NEE megakernel TPU lowering OK "
              f"({len(exp.mlir_module())} bytes)")
        return True
    except Exception as e:  # noqa: BLE001 — report and continue
        msg = str(e).splitlines()[0][:300]
        print(f"[{scene}] NEE megakernel TPU lowering FAILED: "
              f"{type(e).__name__}: {msg}")
        return False


def check_grad(scene: str, tri: bool, spp: int,
               tri_mode: str = "onehot", tex: bool = False) -> bool:
    """Lower the fused differentiable megakernel's fwd+bwd (grad_tiles);
    tri=True exercises the per-triangle path — tri_mode='onehot' the
    round-5 on-core slot scatter, 'tape' the HBM tape (dynamic
    plane-offset output stores); tex=True the round-5 staged-atlas
    texel gradients (UV tape + transposed one-hot scatter)."""
    from pathtracer_tpu.render import pallas_grad as pg

    cfg = RenderConfig(width=64, height=48, samples=spp,
                       samples_per_pass=spp)
    sc = get_scene(scene, cfg)
    arrays, meta = sc.pack()
    if not pk.supports_scene(meta):
        print(f"[{scene}] grad SKIP")
        return True
    S, L = (8, 512)
    xs, ys, _pid = pk.tile_pixel_layout(cfg.width, cfg.height, S, L)
    obj, nodes, tris = pk.scene_tables_jnp(arrays, meta,
                                           traversal="classic")
    cam = jnp.asarray(pk.build_camera_vec(sc.camera))
    z = jnp.zeros(xs.shape, jnp.float32)
    tex_arr = arrays.tex_staged if tex else None

    def fn(seed, cam, obj, nodes, tris, px, py, cr, cg, cb):
        return pg.grad_tiles(seed, cam, obj, nodes, tris, px, py,
                             cr, cg, cb, meta=meta, cfg=cfg, spp=spp,
                             total_samples=cfg.samples, tile=(S, L),
                             tri_grads=tri, tri_mode=tri_mode,
                             tex_grads=tex, tex=tex_arr)[0]

    args = (jnp.asarray([0, 0], jnp.int32), cam, obj, nodes, tris,
            jnp.asarray(xs), jnp.asarray(ys), z, z, z)
    tag = (f"grad(tri={tri}/{tri_mode}, spp={spp})" if not tex
           else f"grad(tex, spp={spp})")
    try:
        exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
        print(f"[{scene}] {tag} TPU lowering OK "
              f"({len(exp.mlir_module())} bytes)")
        return True
    except Exception as e:  # noqa: BLE001 — report and continue
        msg = str(e).splitlines()[0][:300]
        print(f"[{scene}] {tag} TPU lowering FAILED: "
              f"{type(e).__name__}: {msg}")
        return False


def check_staged() -> bool:
    """Lower the megakernel with VMEM-STAGED file-backed textures (the
    one-hot MXU texel fetch, _sample_staged): both the single-window
    (h<=128) and two-matmul multi-window (h>128) paths."""
    import numpy as np

    from pathtracer_tpu.render import proctex

    cfg = RenderConfig(width=64, height=48, samples=8, samples_per_pass=8)
    sc = get_scene("textures", cfg)
    mk = lambda h, w: np.asarray(
        proctex.make(("checker", (8, (0.9,) * 3, (0.2,) * 3)), h, w)
    ).copy()
    sc.textures = [mk(128, 128), mk(256, 96), mk(128, 128), mk(128, 128)]
    sc.sphere_textures = [mk(128, 256), mk(128, 256)]
    arrays, meta = sc.pack()
    if not pk.staged_lanes(meta):
        print("[staged] FAILED: textures were not staged")
        return False
    S, L = pk.default_tile(meta)
    xs, ys, _pid = pk.tile_pixel_layout(cfg.width, cfg.height, S, L,
                                        order=pk.default_order(meta))
    obj, nodes, tris = pk.scene_tables_jnp(arrays, meta)
    cam = jnp.asarray(pk.build_camera_vec(sc.camera))

    def fn(seed, cam, obj, nodes, tris, tex, px, py):
        r, g, b = pk.trace_tiles(seed, cam, obj, nodes, tris, px, py,
                                 meta=meta, cfg=cfg, spp=8,
                                 total_samples=cfg.samples, tile=(S, L),
                                 tex=tex)
        return r + g + b

    args = (jnp.asarray([0, 0], jnp.int32), cam, obj, nodes, tris,
            arrays.tex_staged, jnp.asarray(xs), jnp.asarray(ys))
    try:
        exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
        print(f"[staged] megakernel w/ VMEM-staged file textures TPU "
              f"lowering OK ({len(exp.mlir_module())} bytes)")
        return True
    except Exception as e:  # noqa: BLE001 — report and continue
        msg = str(e).splitlines()[0][:300]
        print(f"[staged] TPU lowering FAILED: {type(e).__name__}: {msg}")
        return False


def check_chunk_gated(scene: str) -> bool:
    """Lower the chunk-packed + scratch-gated mesh config (round 4:
    pack_axis='chunk' aligns coherent pencils with PT_SUBPACKET=2's
    leaf-gating chunks; see pallas_kernel.default_pack_axis)."""
    os.environ["PT_SUBPACKET"] = "2"
    try:
        cfg = RenderConfig(width=64, height=48, samples=8,
                           samples_per_pass=8)
        sc = get_scene(scene, cfg)
        arrays, meta = sc.pack()
        S, L = 8, 512
        pack = 4
        xs, ys, _pid = pk.tile_pixel_layout(
            cfg.width, cfg.height, S, L, order="block",
            spp_pack=pack, pack_axis="chunk")
        obj, nodes, tris = pk.scene_tables_jnp(arrays, meta)
        cam = jnp.asarray(pk.build_camera_vec(sc.camera))

        def fn(seed, cam, obj, nodes, tris, px, py):
            r, g, b = pk.trace_tiles(seed, cam, obj, nodes, tris, px, py,
                                     meta=meta, cfg=cfg, spp=8,
                                     total_samples=cfg.samples,
                                     tile=(S, L), spp_pack=pack,
                                     pack_axis="chunk")
            return r + g + b

        args = (jnp.asarray([0, 0], jnp.int32), cam, obj, nodes, tris,
                jnp.asarray(xs), jnp.asarray(ys))
        try:
            exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
            print(f"[{scene}] chunk-packed gated megakernel TPU lowering "
                  f"OK ({len(exp.mlir_module())} bytes)")
            return True
        except Exception as e:  # noqa: BLE001 — report and continue
            msg = str(e).splitlines()[0][:300]
            print(f"[{scene}] chunk-packed gated megakernel TPU lowering "
                  f"FAILED: {type(e).__name__}: {msg}")
            return False
    finally:
        os.environ.pop("PT_SUBPACKET", None)


if __name__ == "__main__":
    scenes = sys.argv[1:] or ["reference", "teapot", "gopher"]
    ok = all([check(s) for s in scenes])
    # new-path coverage: in-kernel NEE, fused grad, batched tri tape
    if not sys.argv[1:]:
        ok &= check_nee("reference")
        ok &= check_grad("reference", tri=False, spp=8)
        ok &= check_grad("teapot", tri=True, spp=4, tri_mode="tape")
        ok &= check_grad("teapot", tri=True, spp=8, tri_mode="onehot")
        ok &= check_grad("textures-train", tri=False, spp=4, tex=True)
        ok &= check_staged()
        ok &= check_chunk_gated("teapot")
    sys.exit(0 if ok else 1)
