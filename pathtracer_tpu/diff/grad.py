"""Differentiable render + distributed training step.

The north-star dimension the reference lacks entirely (BASELINE.json):
gradients of the rendered image w.r.t. continuous material parameters.

What is differentiable:
- object colors, emission, per-triangle colors, texture atlases — these
  enter the estimator only through the linear mask/accum chain
  (tracer.cl:1148-1175), so reverse-mode AD through the bounce fori_loop
  gives exact pathwise gradients
- the roulette DECISIONS (reflect/refract choices, tracer.cl:982-1061) and
  intersection geometry are discrete; they are detached (their comparisons
  produce booleans, which carry no tangents), i.e. detached-sampling
  pathwise gradients for continuous params only (SURVEY.md section 7.5)

Distribution: gradients are psum-reduced over both mesh axes inside the
sharded step, overlapping with the backward pass under XLA.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RenderConfig
from ..render.camera import CameraArrays
from ..render.integrator import render_pass
from ..render.vec3 import Vec3
from ..scene.pack import SceneArrays, SceneMeta


class SceneParams(NamedTuple):
    """The trainable subset of SceneArrays."""
    color: jnp.ndarray       # [No,3]
    emission: jnp.ndarray    # [No,3]
    tri_color: jnp.ndarray   # [Nt,3]
    tex_planar: jnp.ndarray  # [3,n,H,W]
    tex_sphere: jnp.ndarray
    tex_cube: jnp.ndarray


def extract_params(scn: SceneArrays) -> SceneParams:
    return SceneParams(
        color=scn.color,
        emission=scn.emission,
        tri_color=scn.tri_color,
        tex_planar=scn.tex_planar,
        tex_sphere=scn.tex_sphere,
        tex_cube=scn.tex_cube,
    )


def apply_params(scn: SceneArrays, p: SceneParams) -> SceneArrays:
    return scn._replace(
        color=p.color,
        emission=p.emission,
        tri_color=p.tri_color,
        tex_planar=p.tex_planar,
        tex_sphere=p.tex_sphere,
        tex_cube=p.tex_cube,
    )


def render_image_diff(
    params: SceneParams,
    scn: SceneArrays,
    meta: SceneMeta,
    cfg: RenderConfig,
    cam: CameraArrays,
    px: jnp.ndarray,
    py: jnp.ndarray,
    key: jax.Array,
    n_samples: int,
) -> Vec3:
    """Differentiable estimate of P pixels at n_samples spp -> Vec3 [P]."""
    scn = apply_params(scn, params)
    # fixed-trip bounce loop: reverse-mode AD cannot cross a dynamic
    # while_loop (config.py early_exit); float texture sampling so texel
    # gradients flow (the u32 texel-pool path is quantized/non-differentiable)
    cfg = cfg.replace(early_exit=False, trainable_textures=True)
    acc = render_pass(scn, meta, cfg, cam, px, py,
                      jnp.int32(0), n_samples, key)
    return acc * (1.0 / float(n_samples))


def image_loss(params, scn, meta, cfg, cam, px, py, key, n_samples,
               target: Vec3) -> jnp.ndarray:
    img = render_image_diff(params, scn, meta, cfg, cam, px, py, key,
                            n_samples)
    d = img - target
    return jnp.mean(d.x * d.x + d.y * d.y + d.z * d.z) / 3.0


def train_step(params, scn, meta, cfg, cam, px, py, key, n_samples,
               target: Vec3, lr=0.05):
    """Single-device SGD step; returns (new_params, loss)."""
    loss, grads = jax.value_and_grad(image_loss)(
        params, scn, meta, cfg, cam, px, py, key, n_samples, target
    )
    new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return new_params, loss



def _make_target_of(pid, tile_shape):
    """Map an [H, W, 3] target image into the step's tiled (r, g, b)
    layout (pid: tile-slot -> flat pixel index, -1 = padding)."""
    def target_of(img):
        import numpy as np

        flat = np.asarray(img, np.float32).reshape(-1, 3)
        out = np.zeros((pid.shape[0], 3), np.float32)
        sel = pid >= 0
        out[sel] = flat[pid[sel]]
        t = out.reshape(tile_shape + (3,))
        return (jnp.asarray(t[..., 0]), jnp.asarray(t[..., 1]),
                jnp.asarray(t[..., 2]))

    return target_of


def make_megakernel_step(scn, meta, cfg, camera, spp, tile=(8, 512),
                         lr=0.05, interpret=False):
    """SGD step on (color, emission) through the DIFFERENTIABLE MEGAKERNEL
    (render/pallas_grad.py): forward = the production Pallas megakernel,
    backward = one fused replay+tape+accumulate kernel launch. ~50x the
    wavefront AD path's throughput; covers object color + emission
    (per-triangle colors: make_megakernel_step_tri; texture texels:
    wavefront AD only).

    Returns (step, target_of) where step(color, emission, seed_i32,
    target_rgb) -> (new_color, new_emission, loss) is jitted, and
    target_of(img [H, W, 3]) maps an image into the step's tiled target
    layout.
    """
    from ..render import pallas_kernel as pk
    from ..render.pallas_grad import make_diff_render

    W, H = camera.width, camera.height
    S, L = tile
    xs, ys, pid = pk.tile_pixel_layout(W, H, S, L,
                                       order=pk.default_order(meta))
    px = jnp.asarray(xs)
    py = jnp.asarray(ys)
    cam_vec = jnp.asarray(pk.build_camera_vec(camera))
    # the grad megakernel's traversal is classic-only
    obj, nodes, tris = pk.scene_tables_jnp(scn, meta, traversal="classic")
    render = make_diff_render(meta, cfg, spp, cfg.samples, tile,
                              interpret=interpret)
    valid = jnp.asarray((pid >= 0).reshape(px.shape), jnp.float32)
    n_valid = float(valid.sum())
    inv_spp = 1.0 / float(spp)

    target_of = _make_target_of(pid, px.shape)

    def loss_fn(color, emission, seed, tr, tg, tb):
        r, g, b = render(color, emission, seed, cam_vec, obj, nodes,
                         tris, px, py)
        dr = (r * inv_spp - tr) * valid
        dg = (g * inv_spp - tg) * valid
        db = (b * inv_spp - tb) * valid
        return (jnp.sum(dr * dr) + jnp.sum(dg * dg)
                + jnp.sum(db * db)) / (3.0 * n_valid)

    @jax.jit
    def step(color, emission, seed, target):
        tr, tg, tb = target
        (loss, grads) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            color, emission, seed, tr, tg, tb)
        gc, ge = grads
        return color - lr * gc, emission - lr * ge, loss

    return step, target_of


def make_megakernel_step_tex(scn, meta, cfg, camera, spp, tile=(8, 512),
                             lr=0.05, interpret=False):
    """SGD step on (color, emission, STAGED TEXTURE ATLAS) through the
    differentiable megakernel's tex mode (pallas_grad.
    make_diff_render_tex): texel gradients accumulate on-core via the
    transposed one-hot fetch — no HBM tape, no gathers (round 5;
    previously texture texels trained only through the wavefront AD
    path at ~25x lower throughput).

    Returns (step, target_of): step(color, emission, tex [128, Ltot],
    seed_i32 [2], target_rgb) -> (new_color, new_emission, new_tex,
    loss), jitted. tex is SceneArrays.tex_staged; padded lanes get
    exactly-zero gradients (no ray samples them)."""
    from ..render import pallas_kernel as pk
    from ..render.pallas_grad import make_diff_render_tex

    W, H = camera.width, camera.height
    S, L = tile
    xs, ys, pid = pk.tile_pixel_layout(W, H, S, L,
                                       order=pk.default_order(meta))
    px = jnp.asarray(xs)
    py = jnp.asarray(ys)
    cam_vec = jnp.asarray(pk.build_camera_vec(camera))
    obj, nodes, tris = pk.scene_tables_jnp(scn, meta, traversal="classic")
    render = make_diff_render_tex(meta, cfg, spp, cfg.samples, tile,
                                  interpret=interpret)
    valid = jnp.asarray((pid >= 0).reshape(px.shape), jnp.float32)
    n_valid = float(valid.sum())
    inv_spp = 1.0 / float(spp)

    target_of = _make_target_of(pid, px.shape)

    def loss_fn(color, emission, tex, seed, tr, tg, tb):
        r, g, b = render(color, emission, tex, seed, cam_vec, obj,
                         nodes, tris, px, py)
        dr = (r * inv_spp - tr) * valid
        dg = (g * inv_spp - tg) * valid
        db = (b * inv_spp - tb) * valid
        return (jnp.sum(dr * dr) + jnp.sum(dg * dg)
                + jnp.sum(db * db)) / (3.0 * n_valid)

    @jax.jit
    def step(color, emission, tex, seed, target):
        tr, tg, tb = target
        (loss, grads) = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
            color, emission, tex, seed, tr, tg, tb)
        gc, ge, gt = grads
        return (color - lr * gc, emission - lr * ge, tex - lr * gt,
                loss)

    return step, target_of


def make_megakernel_step_tri(scn, meta, cfg, camera, n_passes=2,
                             tile=(8, 512), lr=0.05, interpret=False,
                             spp=4):
    """SGD step on (color, emission, PER-TRIANGLE color) through the
    differentiable megakernel's tri mode (pallas_grad.
    make_diff_render_tri). Each kernel launch renders `spp` samples;
    under the round-5 default tri_mode='onehot' (on-core slot scatter)
    spp is unbounded — use n_passes=1, spp=budget. Under
    PT_TRI_GRAD=tape the per-(sample, bounce) HBM tape's VMEM block
    budget caps spp per launch (~4 at (8,512)) and the step accumulates
    `n_passes` launches with distinct PRNG streams
    (common-random-number across step invocations — same seed, same
    estimator, the property inverse rendering needs). Total samples
    per step = n_passes * spp.

    Returns (step, target_of): step(color, emission, tri_color,
    seed_i32 [2], target_rgb) -> (new_color, new_emission,
    new_tri_color, loss), jitted. tri_color is SceneArrays.tri_color
    shaped [n_slots, 3] (padded slots get exactly-zero gradients)."""
    from ..render import pallas_kernel as pk
    from ..render.pallas_grad import make_diff_render_tri

    W, H = camera.width, camera.height
    S, L = tile
    xs, ys, pid = pk.tile_pixel_layout(W, H, S, L,
                                       order=pk.default_order(meta))
    px = jnp.asarray(xs)
    py = jnp.asarray(ys)
    cam_vec = jnp.asarray(pk.build_camera_vec(camera))
    # the grad megakernel's traversal is classic-only
    obj, nodes, tris = pk.scene_tables_jnp(scn, meta, traversal="classic")
    total = n_passes * spp
    render = make_diff_render_tri(meta, cfg, total, tile,
                                  interpret=interpret, spp=spp)
    valid = jnp.asarray((pid >= 0).reshape(px.shape), jnp.float32)
    n_valid = float(valid.sum())
    inv = 1.0 / float(total)

    target_of = _make_target_of(pid, px.shape)

    def loss_fn(color, emission, tri_color, seed, tr, tg, tb):
        racc = jnp.zeros(px.shape, jnp.float32)
        gacc = jnp.zeros(px.shape, jnp.float32)
        bacc = jnp.zeros(px.shape, jnp.float32)
        for i in range(n_passes):
            # distinct PRNG stream per pass; the DoF sunflower base
            # advances by the launch's spp samples
            sd = jnp.stack([seed[0] + i * 7919, seed[1] + i * spp])
            r, g, b = render(color, emission, tri_color, sd, cam_vec,
                             obj, nodes, tris, px, py)
            racc = racc + r
            gacc = gacc + g
            bacc = bacc + b
        dr = (racc * inv - tr) * valid
        dg = (gacc * inv - tg) * valid
        db = (bacc * inv - tb) * valid
        return (jnp.sum(dr * dr) + jnp.sum(dg * dg)
                + jnp.sum(db * db)) / (3.0 * n_valid)

    @jax.jit
    def step(color, emission, tri_color, seed, target):
        tr, tg, tb = target
        (loss, grads) = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
            color, emission, tri_color, seed, tr, tg, tb)
        gc, ge, gt = grads
        return (color - lr * gc, emission - lr * ge,
                tri_color - lr * gt, loss)

    return step, target_of


def make_sharded_megakernel_step(scn, meta, cfg, camera, mesh: Mesh, spp,
                                 tile=(8, 512), lr=0.05, interpret=False):
    """Distributed SGD step on (color, emission) through the FUSED
    DIFFERENTIABLE MEGAKERNEL (render/pallas_grad.py) — the fast
    estimator (~23x the wavefront AD path), shard_mapped over
    ('pixels','spp') with psum-reduced gradients riding ICI.

    Layout mirrors render_sharded_pallas: tile rows sharded over
    'pixels' (shard_granule keeps whole tiles per shard), the sample
    budget split over 'spp' (per-rank local_spp = ceil(spp/axis), each
    rank an independent estimate), scene tables replicated. Per-shard
    pathwise grads are psum'd over 'pixels' and pmean'd over 'spp'
    INSIDE the step so XLA overlaps the collectives with the backward
    pass (north-star dimension: fwd+bwd with gradient psum over ICI —
    the reference, internal/ocl/tracer.cl, has no gradients at all).

    Returns (step, target_of): step(color, emission, seed [2] i32,
    target) -> (new_color, new_emission, loss), jitted over the mesh;
    target_of(img [H, W, 3]) -> tiled (tr, tg, tb) in the step's
    sharded layout. `interpret` runs the kernel in interpret mode with
    the software PRNG (the CPU-mesh test/dryrun path).
    """
    from ..render import pallas_kernel as pk
    from ..render.pallas_grad import make_diff_render

    W, H = camera.width, camera.height
    S, L = tile
    n_pix_shards = mesh.shape["pixels"]
    spp_axis = mesh.shape["spp"]
    local_spp = max(1, -(-spp // spp_axis))   # round UP (driver behavior)
    xs, ys, pid = pk.tile_pixel_layout(W, H, S, L,
                                       shard_granule=n_pix_shards,
                                       order=pk.default_order(meta))
    px = jnp.asarray(xs)
    py = jnp.asarray(ys)
    cam_vec = jnp.asarray(pk.build_camera_vec(camera))
    # the grad megakernel's traversal is classic-only
    obj, nodes, tris = pk.scene_tables_jnp(scn, meta, traversal="classic")
    render = make_diff_render(meta, cfg, local_spp, cfg.samples, tile,
                              interpret=interpret)
    valid = jnp.asarray((pid >= 0).reshape(px.shape), jnp.float32)
    n_valid = float(np.sum(pid >= 0))
    inv_spp = 1.0 / float(local_spp)

    target_of = _make_target_of(pid, px.shape)

    def body(color, emission, seed, cam_vec, obj, nodes, tris,
             px_s, py_s, valid_s, tr, tg, tb):
        pix_rank = jax.lax.axis_index("pixels")
        spp_rank = jax.lax.axis_index("spp")
        # independent PRNG stream per (pixel shard, spp rank); the DoF
        # sunflower base gives each spp rank its slice of the samples
        sd = jnp.stack([
            seed[0] * 7919 + pix_rank * jnp.int32(spp_axis)
            + spp_rank + 1,
            seed[1] + spp_rank * jnp.int32(local_spp),
        ])

        def local_loss(color, emission):
            r, g, b = render(color, emission, sd, cam_vec, obj, nodes,
                             tris, px_s, py_s)
            dr = (r * inv_spp - tr) * valid_s
            dg = (g * inv_spp - tg) * valid_s
            db = (b * inv_spp - tb) * valid_s
            # normalized by the GLOBAL valid-pixel count: the psum over
            # 'pixels' then reassembles the full-image MSE
            return (jnp.sum(dr * dr) + jnp.sum(dg * dg)
                    + jnp.sum(db * db)) / (3.0 * n_valid)

        loss, (gc, ge) = jax.value_and_grad(local_loss, argnums=(0, 1))(
            color, emission)
        loss = jax.lax.pmean(jax.lax.psum(loss, "pixels"), "spp")
        gc = jax.lax.pmean(jax.lax.psum(gc, "pixels"), "spp")
        ge = jax.lax.pmean(jax.lax.psum(ge, "pixels"), "spp")
        return color - lr * gc, emission - lr * ge, loss

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(),
                  P("pixels"), P("pixels"), P("pixels"),
                  P("pixels"), P("pixels"), P("pixels")),
        out_specs=(P(), P(), P()),
        check_vma=False,  # bounce-loop carry VMA (see render_dist.py)
    ))

    def step(color, emission, seed, target):
        tr, tg, tb = target
        return fn(color, emission, seed, cam_vec, obj, nodes, tris,
                  px, py, valid, tr, tg, tb)

    return step, target_of


def make_sharded_train_step(
    mesh: Mesh,
    meta: SceneMeta,
    cfg: RenderConfig,
    n_samples: int,
    lr: float = 0.05,
    optimizer=None,
):
    """Build the jit-able distributed training step.

    Sharding layout: params + scene + camera replicated, pixels sharded over
    the 'pixels' axis, samples split over the 'spp' axis. Per-device pathwise
    gradients are psum-reduced over BOTH axes — the psum is emitted inside
    the step so XLA overlaps it with the backward pass over ICI.

    `optimizer` is any optax GradientTransformation; None means plain SGD
    at `lr` with the same (params, ...) -> (new_params, loss) signature as
    before. With an optimizer the returned step takes and returns an
    opt_state: (params, opt_state, ...) -> (new_params, new_opt_state,
    loss); initialize it with `optimizer.init(params)` (replicated — the
    gradients are pmean-reduced before the update, so every device holds
    identical optimizer state).
    """

    def step(params, opt_state, scn, cam, px, py, target, key):
        pix_rank = jax.lax.axis_index("pixels")
        spp_rank = jax.lax.axis_index("spp")
        k = jax.random.fold_in(jax.random.fold_in(key, pix_rank), spp_rank)

        def local_loss(p):
            return image_loss(p, scn, meta, cfg, cam, px, py, k, n_samples,
                              target)

        loss, grads = jax.value_and_grad(local_loss)(params)
        loss = jax.lax.pmean(jax.lax.pmean(loss, "pixels"), "spp")
        grads = jax.tree.map(
            lambda g: jax.lax.pmean(jax.lax.pmean(g, "pixels"), "spp"), grads
        )
        if optimizer is None:
            new_params = jax.tree.map(lambda p, g: p - lr * g, params,
                                      grads)
            return new_params, loss
        import optax

        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss

    if optimizer is None:
        fn = lambda params, scn, cam, px, py, target, key: step(  # noqa: E731
            params, None, scn, cam, px, py, target, key)
        n_rep_in, n_rep_out = 1, 1    # params in; params out
    else:
        fn = step
        n_rep_in, n_rep_out = 2, 2    # + opt_state in and out
    return jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            # replicated leading args (params [, opt_state] + scn + cam),
            # then sharded pixel/target streams and the replicated key
            in_specs=(P(),) * (n_rep_in + 2) + (
                P("pixels"), P("pixels"), P("pixels"), P()),
            out_specs=(P(),) * n_rep_out + (P(),),
            check_vma=False,  # see render_dist.py: bounce-loop carry VMA
        )
    )
