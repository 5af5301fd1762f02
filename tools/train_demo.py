"""Inverse-rendering demo: recover scene material colors from a target
image by gradient descent through the differentiable renderer.

The demo perturbs the reference Cornell scene's sphere colors, then
optimizes them back toward a target render of the TRUE scene with adam
through the differentiable renderer (jit value_and_grad of the image
loss; the distributed equivalent is diff.make_sharded_train_step, tested
in tests/test_grad.py). Outputs a side-by-side PNG
(target | perturbed | recovered) plus the loss curve.

Usage:
    python tools/train_demo.py [--steps 200] [--out docs/renders/train_demo.png]
    python tools/train_demo.py --tri --scene teapot   # MESH inverse
        # rendering: recover PER-TRIANGLE colors through the fused
        # differentiable megakernel's spp-batched tri tape
        # (diff.make_megakernel_step_tri / pallas_grad.make_diff_render_tri)

Works on CPU (JAX_PLATFORMS=cpu, slower) or the TPU chip (--tri needs
the TPU or --interpret).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, ".")

# honor JAX_PLATFORMS=cpu BEFORE backend init: the axon TPU plugin
# force-resets the env var at interpreter start, so without this a
# "CPU" run silently attaches to the TPU tunnel — crashing any
# concurrent TPU job (tests/conftest.py has the same workaround)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--out", default="docs/renders/train_demo.png")
    ap.add_argument("--tri", action="store_true",
                    help="mesh mode: recover per-triangle colors via the "
                         "differentiable megakernel tri tape")
    ap.add_argument("--tex", action="store_true",
                    help="texture mode: recover the staged texel atlas "
                         "via the fast-path texel gradients "
                         "(pallas_grad.make_diff_render_tex)")
    ap.add_argument("--scene", default="teapot")
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode kernels (CPU; slow, tiny sizes)")
    args = ap.parse_args()
    if args.tri:
        return main_tri(args)
    if args.tex:
        return main_tex(args)

    import jax
    import jax.numpy as jnp
    import optax

    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.diff import extract_params, render_image_diff
    from pathtracer_tpu.io.png import write_png
    from pathtracer_tpu.render.vec3 import Vec3
    from pathtracer_tpu.scene.pack import pack_scene
    from pathtracer_tpu.scenes import get_scene

    W, H = args.width, args.height
    cfg = RenderConfig(width=W, height=H, samples=args.spp,
                       samples_per_pass=args.spp)
    sc = get_scene("reference", cfg)
    arrays, meta = pack_scene(sc.objects)
    cam = sc.camera.pack()

    ys, xs = np.mgrid[0:H, 0:W]
    n_dev = len(jax.devices())
    P = W * H
    pad = 0
    px = jnp.asarray(np.concatenate([xs.ravel(), np.zeros(pad)]), jnp.int32)
    py = jnp.asarray(np.concatenate([ys.ravel(), np.zeros(pad)]), jnp.int32)

    def render(params, key, spp):
        acc = render_image_diff(params, arrays, meta, cfg, cam, px, py,
                                key, spp)
        img = np.stack([np.asarray(acc.x), np.asarray(acc.y),
                        np.asarray(acc.z)], -1)[:P]
        return img.reshape(H, W, 3)

    true_params = extract_params(arrays)
    key = jax.random.PRNGKey(0)
    # COMMON RANDOM NUMBERS: the target uses the SAME key and spp as
    # every training estimate, so the Monte-Carlo noise cancels in the
    # loss and what remains is pure parameter mismatch — without this,
    # the per-step gradient signal of small objects drowns in estimator
    # noise at low spp
    train_key = jax.random.fold_in(key, 12345)
    target_img = render(true_params, train_key, args.spp)
    target = Vec3(
        jnp.asarray(np.concatenate([target_img[..., 0].ravel(),
                                    np.zeros(pad)]), jnp.float32),
        jnp.asarray(np.concatenate([target_img[..., 1].ravel(),
                                    np.zeros(pad)]), jnp.float32),
        jnp.asarray(np.concatenate([target_img[..., 2].ravel(),
                                    np.zeros(pad)]), jnp.float32),
    )

    # perturb the SPHERE colors — directly visible, so the inverse
    # problem is well-identified (perturbing every wall at once lets the
    # optimizer fit the image through color trade-offs instead of
    # recovering the true values)
    from pathtracer_tpu.scene.shapes import SPHERE

    sphere_rows = np.asarray(
        [t == SPHERE for t in meta.obj_types]
        + [False] * (meta.max_objects - meta.n_objects))
    rng = np.random.default_rng(3)
    bad_color = np.asarray(true_params.color).copy()
    bad_color[sphere_rows] = np.clip(
        bad_color[sphere_rows]
        + rng.uniform(-0.5, 0.5, bad_color[sphere_rows].shape),
        0.05, 1.0)
    params = true_params._replace(color=jnp.asarray(bad_color))
    initial_img = render(params, jax.random.fold_in(key, 998), 64)
    display_target = render(true_params, jax.random.fold_in(key, 999), 64)
    mask = jnp.asarray(sphere_rows[:, None], jnp.float32)

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    from pathtracer_tpu.diff.grad import image_loss

    @jax.jit
    def step(params, opt_state):
        # the estimate uses EXACTLY train_key — the same streams as the
        # target render above, completing the common-random-numbers pairing
        loss, grads = jax.value_and_grad(image_loss)(
            params, arrays, meta, cfg, cam, px, py, train_key, args.spp,
            target)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    losses = []
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state)
        # projected descent on the sphere colors only: every other
        # parameter stays at truth (otherwise the optimizer games the
        # image loss through emission/texture trade-offs), and colors
        # project back into the physical [0, 1] box
        color = (jnp.clip(params.color, 0.0, 1.0) * mask
                 + true_params.color * (1.0 - mask))
        params = true_params._replace(color=color)
        losses.append(float(loss))
        if i % 25 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {losses[-1]:.6f}", flush=True)
    dt = time.time() - t0

    recovered_img = render(params, jax.random.fold_in(key, 997), 64)
    true_c = np.asarray(true_params.color)[sphere_rows]
    err0 = float(np.abs(true_c - bad_color[sphere_rows]).mean())
    err1 = float(np.abs(
        true_c - np.asarray(params.color)[sphere_rows]).mean())
    print(f"{args.steps} steps in {dt:.1f}s on {n_dev} device(s); "
          f"loss {losses[0]:.5f} -> {losses[-1]:.5f}; "
          f"color MAD {err0:.4f} -> {err1:.4f}")

    strip = np.concatenate([display_target, initial_img, recovered_img],
                           axis=1)
    write_png(args.out, strip)
    print(f"wrote {args.out} (target | perturbed | recovered)")
    return err0, err1


def main_tri(args):
    """Mesh inverse rendering: perturb every real triangle's color, then
    recover by adam through the differentiable megakernel's per-triangle
    tape (per-triangle materials: reference scene.go:100-101 /
    tracer.cl:672; the reference itself has no gradients at all)."""
    import jax
    import jax.numpy as jnp
    import optax

    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.io.png import write_png
    from pathtracer_tpu.render import pallas_kernel as pk
    from pathtracer_tpu.render.pallas_grad import make_diff_render_tri
    from pathtracer_tpu.scenes import get_scene

    W, H = args.width, args.height
    cfg = RenderConfig(width=W, height=H, samples=args.spp,
                       samples_per_pass=args.spp)
    sc = get_scene(args.scene, cfg)
    arrays, meta = sc.pack()
    assert meta.has_groups, "--tri needs a mesh scene (e.g. teapot)"
    S, L = (8, 512) if not args.interpret else (8, 128)
    xs, ys, pid = pk.tile_pixel_layout(W, H, S, L,
                                       order=pk.default_order(meta))
    px = jnp.asarray(xs)
    py = jnp.asarray(ys)
    cam_vec = jnp.asarray(pk.build_camera_vec(sc.camera))
    obj, nodes, tris = pk.scene_tables_jnp(arrays, meta,
                                           traversal="classic")
    # tape mode (PT_TRI_GRAD=tape): spp per launch is capped by the tri
    # tape's VMEM block budget — accumulate passes for the requested
    # total. onehot mode (round-5 default, on-core slot scatter): no
    # tape, no cap — one launch carries the whole budget.
    import os as _os

    if _os.environ.get("PT_TRI_GRAD", "onehot") == "tape":
        spp = min(args.spp, 4)
    else:
        spp = args.spp
    n_passes = max(1, args.spp // spp)
    total = n_passes * spp
    render = make_diff_render_tri(meta, cfg, total, (S, L), spp=spp,
                                  interpret=args.interpret)
    valid = jnp.asarray((pid >= 0).reshape(px.shape), jnp.float32)
    n_valid = float(np.asarray(valid).sum())
    inv = 1.0 / float(total)
    # fixed seeds: COMMON RANDOM NUMBERS between the target and every
    # training estimate (see the sphere demo above)
    seeds = [jnp.asarray([11 + i * 7919, i * spp], jnp.int32)
             for i in range(n_passes)]

    def forward(c, e, tc):
        r = g = b = jnp.zeros(px.shape, jnp.float32)
        for sd in seeds:
            rr, gg, bb = render(c, e, tc, sd, cam_vec, obj, nodes, tris,
                                px, py)
            r, g, b = r + rr, g + gg, b + bb
        return r * inv, g * inv, b * inv

    color = arrays.color.astype(jnp.float32)
    emission = arrays.emission.astype(jnp.float32)
    tc_true = jnp.asarray(arrays.tri_color, jnp.float32)
    # real (non-padding) triangle slots have a nonzero geometric normal
    ng = np.cross(np.asarray(arrays.tri_e1), np.asarray(arrays.tri_e2))
    real = (ng * ng).sum(axis=1) > 0
    rng = np.random.default_rng(5)
    tc0 = np.asarray(tc_true).copy()
    tc0[real] = np.clip(
        tc0[real] + rng.uniform(-0.35, 0.35, tc0[real].shape), 0.05, 1.0)
    tc0 = jnp.asarray(tc0)

    target = [jax.lax.stop_gradient(t)
              for t in jax.jit(forward)(color, emission, tc_true)]

    def loss_fn(tc):
        r, g, b = forward(color, emission, tc)
        return sum(jnp.sum(((x - t) * valid) ** 2)
                   for x, t in zip((r, g, b), target)) / (3.0 * n_valid)

    opt = optax.adam(args.lr)
    opt_state = opt.init(tc0)

    @jax.jit
    def step(tc, st):
        loss, gt = jax.value_and_grad(loss_fn)(tc)
        up, st = opt.update(gt, st, tc)
        tc = jnp.clip(optax.apply_updates(tc, up), 0.0, 1.0)
        return tc, st, loss

    tc = tc0
    tc, opt_state, loss0 = step(tc, opt_state)   # compile + step 0
    float(loss0)
    t0 = time.time()
    losses = [float(loss0)]
    for i in range(1, args.steps):
        tc, opt_state, loss = step(tc, opt_state)
        losses.append(float(loss))
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {losses[-1]:.6f}", flush=True)
    dt = time.time() - t0
    rate = W * H * total * max(1, args.steps - 1) / dt / 1e6

    err0 = float(np.abs(np.asarray(tc_true)[real] - tc0[real]).mean())
    err1 = float(np.abs(np.asarray(tc_true)[real]
                        - np.asarray(tc)[real]).mean())
    print(f"{args.steps} tri steps in {dt:.1f}s "
          f"({rate:.2f} Msamples/s fwd+bwd, {real.sum()} triangles); "
          f"loss {losses[0]:.6f} -> {losses[-1]:.6f}; "
          f"tri-color MAD {err0:.4f} -> {err1:.4f}")

    def to_img(tcv):
        r, g, b = jax.jit(forward)(color, emission, tcv)
        img = np.stack([np.asarray(r).ravel(), np.asarray(g).ravel(),
                        np.asarray(b).ravel()], -1)
        return pk.untile_image(img, pid, W, H).reshape(H, W, 3)

    strip = np.concatenate(
        [to_img(tc_true), to_img(tc0), to_img(tc)], axis=1)
    out = args.out if args.out != "docs/renders/train_demo.png"         else "docs/renders/train_demo_tri.png"
    write_png(out, strip)
    print(f"wrote {out} (target | perturbed | recovered)")
    return err0, err1


def main_tex(args):
    """Texture recovery: perturb the staged texel atlas, then recover it
    by adam through the fast-path texel gradients (round 5,
    pallas_grad.make_diff_render_tex — the north star's
    material/texture/emission gradient dimension). Use
    --scene textures-train (normal maps off; nm texels redirect rays
    and are excluded from texel training)."""
    import jax
    import jax.numpy as jnp
    import optax

    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.io.png import write_png
    from pathtracer_tpu.render import pallas_kernel as pk
    from pathtracer_tpu.render.pallas_grad import make_diff_render_tex
    from pathtracer_tpu.scenes import get_scene

    scene = args.scene if args.scene != "teapot" else "textures-train"
    W, H = args.width, args.height
    cfg = RenderConfig(width=W, height=H, samples=args.spp,
                       samples_per_pass=args.spp)
    sc = get_scene(scene, cfg)
    arrays, meta = sc.pack()
    assert pk.staged_lanes(meta) > 0, \
        "--tex needs a staged-texture scene (e.g. textures-train)"
    S, L = (8, 512) if not args.interpret else (8, 128)
    xs, ys, pid = pk.tile_pixel_layout(W, H, S, L,
                                       order=pk.default_order(meta))
    px = jnp.asarray(xs)
    py = jnp.asarray(ys)
    cam_vec = jnp.asarray(pk.build_camera_vec(sc.camera))
    obj, nodes, tris = pk.scene_tables_jnp(arrays, meta,
                                           traversal="classic")
    spp = args.spp
    render = make_diff_render_tex(meta, cfg, spp, cfg.samples, (S, L),
                                  interpret=args.interpret)
    valid = jnp.asarray((pid >= 0).reshape(px.shape), jnp.float32)
    n_valid = float(np.asarray(valid).sum())
    inv = 1.0 / float(spp)
    seed = jnp.asarray([23, 0], jnp.int32)   # common random numbers

    def forward(c, e, tex):
        r, g, b = render(c, e, tex, seed, cam_vec, obj, nodes, tris,
                         px, py)
        return r * inv, g * inv, b * inv

    color = arrays.color.astype(jnp.float32)
    emission = arrays.emission.astype(jnp.float32)
    tex_true = arrays.tex_staged.astype(jnp.float32)

    # active texel lanes from the staged descriptors (padding lanes get
    # exactly-zero gradients — nothing samples them)
    active = np.zeros(tex_true.shape, bool)
    for (_s, d, *_r) in meta.obj_tex:
        if isinstance(d, tuple) and d and d[0] == "__staged__":
            _, base, w, h = d
            hb = -(-h // 128)
            active[:min(h, 128), base: base + 3 * hb * w] = True
    rng = np.random.default_rng(7)
    tex0 = np.asarray(tex_true).copy()
    tex0[active] = np.clip(
        tex0[active] + rng.uniform(-0.3, 0.3, int(active.sum())),
        0.0, 1.0)
    tex0 = jnp.asarray(tex0)

    target = [jax.lax.stop_gradient(t)
              for t in jax.jit(forward)(color, emission, tex_true)]

    def loss_fn(tex):
        r, g, b = forward(color, emission, tex)
        return sum(jnp.sum(((x - t) * valid) ** 2)
                   for x, t in zip((r, g, b), target)) / (3.0 * n_valid)

    opt = optax.adam(args.lr)
    opt_state = opt.init(tex0)

    @jax.jit
    def step(tex, st):
        loss, gt = jax.value_and_grad(loss_fn)(tex)
        up, st = opt.update(gt, st, tex)
        tex = jnp.clip(optax.apply_updates(tex, up), 0.0, 1.0)
        return tex, st, loss

    tex = tex0
    tex, opt_state, loss0 = step(tex, opt_state)   # compile + step 0
    float(loss0)
    t0 = time.time()
    losses = [float(loss0)]
    for i in range(1, args.steps):
        tex, opt_state, loss = step(tex, opt_state)
        losses.append(float(loss))
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {losses[-1]:.6f}", flush=True)
    dt = time.time() - t0
    rate = W * H * spp * max(1, args.steps - 1) / dt / 1e6

    err0 = float(np.abs(np.asarray(tex0)[active]
                        - np.asarray(tex_true)[active]).mean())
    err1 = float(np.abs(np.asarray(tex)[active]
                        - np.asarray(tex_true)[active]).mean())
    print(f"{args.steps} tex steps in {dt:.1f}s "
          f"({rate:.2f} Msamples/s fwd+bwd, "
          f"{int(active.sum())} active texel lanes); "
          f"loss {losses[0]:.6f} -> {losses[-1]:.6f}; "
          f"texel MAD {err0:.4f} -> {err1:.4f}")

    def to_img(tv):
        r, g, b = jax.jit(forward)(color, emission, tv)
        img = np.stack([np.asarray(r).ravel(), np.asarray(g).ravel(),
                        np.asarray(b).ravel()], -1)
        return pk.untile_image(img, pid, W, H).reshape(H, W, 3)

    strip = np.concatenate(
        [to_img(tex_true), to_img(tex0), to_img(tex)], axis=1)
    out = (args.out if args.out != "docs/renders/train_demo.png"
           else "docs/renders/train_demo_tex.png")
    write_png(out, strip)
    print(f"wrote {out} (target | perturbed | recovered)")
    return err0, err1


if __name__ == "__main__":
    main()
