"""Differentiable megakernel (render/pallas_grad.py) correctness.

The estimator is deterministic given a seed (on-core PRNG), so gradients
can be checked EXACTLY against central finite differences with common
random numbers — the same-seed trick that makes inverse rendering work at
all (tools/train_demo.py). The estimator is multilinear in object colors
(a path hitting object j twice contributes c_j^2), and central
differences are exact for quadratics, so tolerances are f32-rounding
level, not MC level.

TPU-only: the megakernel's on-core PRNG has no CPU lowering.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.scenes import get_scene

_tpu = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs a TPU device"
)

TILE = (8, 128)


def _setup(samples=32):
    cfg = RenderConfig(width=32, height=24, samples=samples,
                       samples_per_pass=samples)
    sc = get_scene("reference", cfg)
    arrays, meta = sc.pack()
    from pathtracer_tpu.render import pallas_kernel as pk

    S, L = TILE
    xs, ys, pid = pk.tile_pixel_layout(cfg.width, cfg.height, S, L)
    px = jnp.asarray(xs)
    py = jnp.asarray(ys)
    cam_vec = jnp.asarray(pk.build_camera_vec(sc.camera))
    obj, nodes, tris = pk.scene_tables_jnp(arrays, meta,
                                            traversal="classic")
    return cfg, sc, arrays, meta, cam_vec, obj, nodes, tris, px, py, pid


@_tpu
def test_megakernel_grad_matches_finite_difference():
    from pathtracer_tpu.render.pallas_grad import make_diff_render

    cfg, sc, arrays, meta, cam_vec, obj, nodes, tris, px, py, pid = \
        _setup(samples=8)
    render = make_diff_render(meta, cfg, 8, cfg.samples, TILE)
    seed = jnp.asarray([3, 0], jnp.int32)
    color = arrays.color.astype(jnp.float32)
    emission = arrays.emission.astype(jnp.float32)

    # random fixed per-slot weights -> scalar loss
    rng = np.random.default_rng(0)
    wr, wg, wb = (jnp.asarray(rng.random(px.shape), jnp.float32)
                  for _ in range(3))

    def loss(c, e):
        r, g, b = render(c, e, seed, cam_vec, obj, nodes, tris, px, py)
        return jnp.sum(r * wr) + jnp.sum(g * wg) + jnp.sum(b * wb)

    gc, ge = jax.grad(loss, argnums=(0, 1))(color, emission)
    gc = np.asarray(gc)
    ge = np.asarray(ge)
    assert np.isfinite(gc).all() and np.isfinite(ge).all()
    assert np.abs(gc).max() > 0 and np.abs(ge).max() > 0

    # central finite differences on a handful of components, same seed.
    # Color is continuous everywhere (no roulette branch reads it).
    # Emission is only perturbed on objects that are ALREADY lights:
    # at e == 0 the is_light branch flips (paths terminate on the newly
    # emissive surface), a genuine estimator discontinuity where the
    # pathwise gradient is one-sided — same semantics as the wavefront
    # AD path.
    h = 2e-3
    checked = 0
    cases = ([("color", j, c) for (j, c) in
              [(1, 0), (6, 2), (0, 1), (7, 0)]]        # walls/spheres
             + [("emission", 0, c) for c in (0, 1, 2)])  # the light
    for which, j, c in cases:
        base = color if which == "color" else emission
        delta = jnp.zeros_like(base).at[j, c].set(h)
        if which == "color":
            lp = loss(color + delta, emission)
            lm = loss(color - delta, emission)
            g_an = gc[j, c]
        else:
            lp = loss(color, emission + delta)
            lm = loss(color, emission - delta)
            g_an = ge[j, c]
        g_fd = float((lp - lm) / (2 * h))
        scale = max(abs(g_fd), abs(float(g_an)), 1e-3)
        assert abs(g_fd - float(g_an)) / scale < 5e-2, (
            which, j, c, g_fd, float(g_an))
        checked += 1
    assert checked == 7


def _setup_mesh(samples=4):
    cfg = RenderConfig(width=16, height=12, samples=samples,
                       samples_per_pass=samples)
    sc = get_scene("teapot", cfg)
    arrays, meta = sc.pack()
    from pathtracer_tpu.render import pallas_kernel as pk

    S, L = TILE
    xs, ys, pid = pk.tile_pixel_layout(cfg.width, cfg.height, S, L)
    px = jnp.asarray(xs)
    py = jnp.asarray(ys)
    cam_vec = jnp.asarray(pk.build_camera_vec(sc.camera))
    obj, nodes, tris = pk.scene_tables_jnp(arrays, meta,
                                           traversal="classic")
    return cfg, sc, arrays, meta, cam_vec, obj, nodes, tris, px, py, pid


def test_tri_grad_render_traces():
    """CPU shape-level smoke: the tri-grad custom_vjp (forward
    megakernel + grad kernel with the per-triangle tape + segment-sum)
    traces end-to-end under jax.eval_shape — catches kernel-body
    Python/shape bugs without TPU hardware (abstract eval never runs
    Mosaic)."""
    from pathtracer_tpu.render.pallas_grad import make_diff_render_tri

    cfg, sc, arrays, meta, cam_vec, obj, nodes, tris, px, py, pid = \
        _setup_mesh(samples=1)
    render = make_diff_render_tri(meta, cfg, cfg.samples, TILE)
    seed = jnp.asarray([3, 0], jnp.int32)
    color = arrays.color.astype(jnp.float32)
    emission = arrays.emission.astype(jnp.float32)
    tri_color = jnp.asarray(arrays.tri_color, jnp.float32)

    def loss(c, e, tc):
        r, g, b = render(c, e, tc, seed, cam_vec, obj, nodes, tris,
                         px, py)
        return jnp.sum(r) + jnp.sum(g) + jnp.sum(b)

    shapes = jax.eval_shape(
        lambda c, e, tc: jax.grad(loss, argnums=(0, 1, 2))(c, e, tc),
        color, emission, tri_color)
    assert shapes[0].shape == color.shape
    assert shapes[1].shape == emission.shape
    assert shapes[2].shape == tri_color.shape


def test_obj_grad_fd_cpu_interpret():
    """Central-finite-difference check of the fused grad kernel ON THE
    CPU: interpret mode + the software PRNG (pallas_kernel._uniform's
    hash stream) make the whole forward+replay+backward machinery
    testable without hardware. Same common-random-number exactness
    argument as the TPU test."""
    from pathtracer_tpu.render.pallas_grad import make_diff_render

    cfg, sc, arrays, meta, cam_vec, obj, nodes, tris, px, py, pid = \
        _setup(samples=4)
    render = make_diff_render(meta, cfg, 4, cfg.samples, TILE,
                              interpret=True)
    seed = jnp.asarray([3, 0], jnp.int32)
    color = arrays.color.astype(jnp.float32)
    emission = arrays.emission.astype(jnp.float32)

    rng = np.random.default_rng(0)
    wr, wg, wb = (jnp.asarray(rng.random(px.shape), jnp.float32)
                  for _ in range(3))

    def loss(c, e):
        r, g, b = render(c, e, seed, cam_vec, obj, nodes, tris, px, py)
        return jnp.sum(r * wr) + jnp.sum(g * wg) + jnp.sum(b * wb)

    gc, ge = jax.grad(loss, argnums=(0, 1))(color, emission)
    gc = np.asarray(gc)
    assert np.isfinite(gc).all() and np.abs(gc).max() > 0

    h = 2e-3
    for j, c in [(1, 0), (6, 2)]:
        delta = jnp.zeros_like(color).at[j, c].set(h)
        g_fd = float((loss(color + delta, emission)
                      - loss(color - delta, emission)) / (2 * h))
        g_an = float(gc[j, c])
        scale = max(abs(g_fd), abs(g_an), 1e-3)
        assert abs(g_fd - g_an) / scale < 5e-2, (j, c, g_fd, g_an)


def test_tri_grad_fd_cpu_interpret():
    """Per-triangle color gradients (slot tape + segment-sum) vs
    central finite differences, entirely on the CPU via interpret mode
    + the software PRNG."""
    from pathtracer_tpu.render.pallas_grad import make_diff_render_tri

    cfg, sc, arrays, meta, cam_vec, obj, nodes, tris, px, py, pid = \
        _setup_mesh(samples=2)
    render = make_diff_render_tri(meta, cfg, cfg.samples, TILE,
                                  interpret=True)
    color = arrays.color.astype(jnp.float32)
    emission = arrays.emission.astype(jnp.float32)
    tri_color = jnp.asarray(arrays.tri_color, jnp.float32)
    seeds = [jnp.asarray([40 + i, i], jnp.int32) for i in range(2)]

    rng = np.random.default_rng(2)
    wr, wg, wb = (jnp.asarray(rng.random(px.shape), jnp.float32)
                  for _ in range(3))

    def loss(tc):
        tot = 0.0
        for sd in seeds:
            r, g, b = render(color, emission, tc, sd, cam_vec, obj,
                             nodes, tris, px, py)
            tot = tot + jnp.sum(r * wr) + jnp.sum(g * wg) \
                + jnp.sum(b * wb)
        return tot

    gt = np.asarray(jax.grad(loss)(tri_color))
    assert np.isfinite(gt).all()
    assert np.abs(gt).max() > 0, "no triangle gradient at all"

    flat = np.abs(gt).ravel()
    picks = np.argsort(flat)[-2:]
    h = 2e-3
    for p in picks:
        s, c = divmod(int(p), 3)
        delta = jnp.zeros_like(tri_color).at[s, c].set(h)
        g_fd = float((loss(tri_color + delta)
                      - loss(tri_color - delta)) / (2 * h))
        g_an = float(gt[s, c])
        scale = max(abs(g_fd), abs(g_an), 1e-3)
        assert abs(g_fd - g_an) / scale < 5e-2, (s, c, g_fd, g_an)


def test_step_descends_cpu_interpret():
    """The FULL megakernel training step (fwd kernel + bwd kernel + SGD
    update) runs end-to-end on the CPU in interpret mode and actually
    descends: rendering a target with the true colors, perturbing them,
    and stepping must shrink the loss. Exercises the same code path the
    TPU inverse-rendering demo uses (diff/grad.make_megakernel_step)."""
    from pathtracer_tpu.diff.grad import make_megakernel_step

    cfg, sc, arrays, meta, cam_vec, obj, nodes, tris, px, py, pid = \
        _setup(samples=4)
    step, target_of = make_megakernel_step(
        arrays, meta, cfg, sc.camera, spp=4, tile=TILE, lr=0.2,
        interpret=True)
    color = arrays.color.astype(jnp.float32)
    emission = arrays.emission.astype(jnp.float32)

    # target = the scene rendered with its TRUE colors (same seed ==
    # common random numbers, so the loss minimum is at the true colors)
    from pathtracer_tpu.render.pallas_grad import make_diff_render

    render = make_diff_render(meta, cfg, 4, cfg.samples, TILE,
                              interpret=True)
    seed = jnp.asarray([7, 0], jnp.int32)
    r, g, b = render(color, emission, seed, cam_vec, obj, nodes, tris,
                     px, py)
    img = np.zeros((cfg.height, cfg.width, 3), np.float32)
    w = np.asarray(pid) >= 0
    flat = np.asarray(pid).ravel()
    for ch, v in enumerate((r, g, b)):
        np.add.at(img.reshape(-1, 3)[:, ch], flat[w.ravel()],
                  np.asarray(v).ravel()[w.ravel()] / 4.0)
    target = target_of(img)

    c = color.at[1, 0].add(0.3).at[6, 2].add(-0.2)
    losses = []
    for i in range(3):
        c, e, loss = step(c, emission, seed, target)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_tri_step_traces():
    """CPU shape-level smoke for the full tri training step (fwd+bwd
    kernels x n_passes + segment-sum + SGD update)."""
    from pathtracer_tpu.diff.grad import make_megakernel_step_tri

    cfg, sc, arrays, meta, cam_vec, obj, nodes, tris, px, py, pid = \
        _setup_mesh(samples=2)
    step, target_of = make_megakernel_step_tri(
        arrays, meta, cfg, sc.camera, n_passes=2, tile=TILE)
    color = arrays.color.astype(jnp.float32)
    emission = arrays.emission.astype(jnp.float32)
    tri_color = jnp.asarray(arrays.tri_color, jnp.float32)
    target = target_of(np.zeros((cfg.height, cfg.width, 3), np.float32))
    seed = jnp.asarray([11, 0], jnp.int32)
    shapes = jax.eval_shape(step, color, emission, tri_color, seed,
                            target)
    assert shapes[0].shape == color.shape
    assert shapes[2].shape == tri_color.shape
    assert shapes[3].shape == ()


@_tpu
def test_tri_grad_matches_finite_difference():
    """Per-triangle color gradients from the megakernel tape vs central
    finite differences with common random numbers (the estimator is
    multilinear in any single slot's color to the path orders that
    matter, so central differences are f32-rounding exact)."""
    from pathtracer_tpu.render.pallas_grad import make_diff_render_tri

    cfg, sc, arrays, meta, cam_vec, obj, nodes, tris, px, py, pid = \
        _setup_mesh(samples=4)
    render = make_diff_render_tri(meta, cfg, cfg.samples, TILE)
    color = arrays.color.astype(jnp.float32)
    emission = arrays.emission.astype(jnp.float32)
    tri_color = jnp.asarray(arrays.tri_color, jnp.float32)
    seeds = [jnp.asarray([40 + i, i], jnp.int32) for i in range(4)]

    rng = np.random.default_rng(2)
    wr, wg, wb = (jnp.asarray(rng.random(px.shape), jnp.float32)
                  for _ in range(3))

    def loss(c, e, tc):
        tot = 0.0
        for sd in seeds:
            r, g, b = render(c, e, tc, sd, cam_vec, obj, nodes, tris,
                             px, py)
            tot = tot + jnp.sum(r * wr) + jnp.sum(g * wg) \
                + jnp.sum(b * wb)
        return tot

    gc, ge, gt = jax.grad(loss, argnums=(0, 1, 2))(
        color, emission, tri_color)
    gt = np.asarray(gt)
    assert np.isfinite(gt).all()
    assert np.abs(gt).max() > 0, "no triangle gradient at all"

    # object-side grads must stay alive too (regression vs the tri tape)
    assert np.abs(np.asarray(gc)).max() > 0
    assert np.abs(np.asarray(ge)).max() > 0

    # FD on the 3 biggest tri-color components
    flat = np.abs(gt).ravel()
    picks = np.argsort(flat)[-3:]
    h = 2e-3
    for p in picks:
        s, c = divmod(int(p), 3)
        delta = jnp.zeros_like(tri_color).at[s, c].set(h)
        lp = loss(color, emission, tri_color + delta)
        lm = loss(color, emission, tri_color - delta)
        g_fd = float((lp - lm) / (2 * h))
        g_an = float(gt[s, c])
        scale = max(abs(g_fd), abs(g_an), 1e-3)
        assert abs(g_fd - g_an) / scale < 5e-2, (s, c, g_fd, g_an)


@_tpu
def test_megakernel_grad_agrees_with_wavefront_ad():
    """Two independent estimators of the same expected gradient must
    agree on its dominant components.

    Uses a LINEAR loss (fixed per-pixel weights): its expected gradient
    E[J^T w] is the same at ANY spp, so the two estimators (different
    RNG streams, different sample counts) are unbiased for the same
    quantity — a quadratic loss would add O(1/spp) self-covariance bias
    that differs between the two. The megakernel side reuses the SAME
    kernel spec as the finite-difference test (each distinct (spp, tile)
    is a fresh multi-minute remote compile here); the wavefront side
    runs on the CPU backend (identical estimator)."""
    import jax

    from pathtracer_tpu.diff.grad import extract_params, render_image_diff
    from pathtracer_tpu.render.pallas_grad import make_diff_render

    cfg, sc, arrays, meta, cam_vec, obj, nodes, tris, px, py, pid = \
        _setup(samples=8)
    render = make_diff_render(meta, cfg, 8, cfg.samples, TILE)

    # per-PIXEL weights, mapped into the megakernel's slot layout
    rng = np.random.default_rng(1)
    w_pix = rng.random((cfg.height * cfg.width, 3)).astype(np.float32)
    w_slot = np.zeros((pid.shape[0], 3), np.float32)
    sel = pid >= 0
    w_slot[sel] = w_pix[pid[sel]]
    ws = w_slot.reshape(px.shape + (3,))
    wr, wg, wb = (jnp.asarray(ws[..., k]) for k in range(3))

    def mk_loss(c, e, seed):
        r, g, b = render(c, e, seed, cam_vec, obj, nodes, tris, px, py)
        inv = 1.0 / 8.0
        return (jnp.sum(r * inv * wr) + jnp.sum(g * inv * wg)
                + jnp.sum(b * inv * wb))

    grad_fn = jax.jit(jax.grad(mk_loss, argnums=(0, 1)))
    color = arrays.color.astype(jnp.float32)
    emission = arrays.emission.astype(jnp.float32)
    gc_mk = np.zeros(color.shape)
    ge_mk = np.zeros(emission.shape)
    n_seeds = 8
    for i in range(n_seeds):
        gc_i, ge_i = grad_fn(color, emission,
                             jnp.asarray([20 + i, 0], jnp.int32))
        gc_mk += np.asarray(gc_i) / n_seeds
        ge_mk += np.asarray(ge_i) / n_seeds

    with jax.default_device(jax.devices("cpu")[0]):
        arrays_c, meta_c = sc.pack()
        params = extract_params(arrays_c)
        cam = sc.camera.pack()
        ys2, xs2 = np.mgrid[0:cfg.height, 0:cfg.width]
        pxw = jnp.asarray(xs2.ravel(), jnp.int32)
        pyw = jnp.asarray(ys2.ravel(), jnp.int32)
        wv = jnp.asarray(w_pix)

        def wf_loss(p):
            img = render_image_diff(p, arrays_c, meta_c, cfg, cam, pxw,
                                    pyw, jax.random.PRNGKey(5), 64)
            return (jnp.sum(img.x * wv[:, 0]) + jnp.sum(img.y * wv[:, 1])
                    + jnp.sum(img.z * wv[:, 2]))

        wf_grads = jax.grad(wf_loss)(params)

    gc_wf = np.asarray(wf_grads.color)
    ge_wf = np.asarray(wf_grads.emission)

    # dominant components agree within MC noise of the two estimates
    for name, mk, wf in (("color", gc_mk, gc_wf),
                         ("emission", ge_mk, ge_wf)):
        big = np.abs(wf) > 0.05 * np.abs(wf).max()
        assert big.any()
        rel = np.abs(mk[big] - wf[big]) / np.abs(wf[big])
        assert np.median(rel) < 0.25, (name, rel, mk[big], wf[big])


def test_sharded_megakernel_step_matches_single_device():
    """The SHARDED fused differentiable megakernel step
    (diff/grad.make_sharded_megakernel_step) on a trivial (1,1) mesh is
    the same computation as make_megakernel_step: same tile layout, same
    estimator, and the (pix_rank=0, spp_rank=0) seed recipe collapses to
    seed[0]*7919 + 1 — so feeding the single-device step that adjusted
    seed reproduces the sharded step's per-ray values exactly. The
    scalar LOSS mean may still differ by ~1 ulp: XLA reassociates the
    pixel reduction differently under shard_map, so the comparison is
    ulp-tolerance, not bitwise."""
    from pathtracer_tpu.diff.grad import (make_megakernel_step,
                                          make_sharded_megakernel_step)
    from pathtracer_tpu.parallel import make_mesh

    cfg, sc, arrays, meta, cam_vec, obj, nodes, tris, px, py, pid = \
        _setup(samples=4)
    mesh = make_mesh(jax.devices()[:1], shape=(1, 1))
    sstep, starget_of = make_sharded_megakernel_step(
        arrays, meta, cfg, sc.camera, mesh, spp=4, tile=TILE, lr=0.2,
        interpret=True)
    lstep, ltarget_of = make_megakernel_step(
        arrays, meta, cfg, sc.camera, spp=4, tile=TILE, lr=0.2,
        interpret=True)

    color = arrays.color.astype(jnp.float32)
    emission = arrays.emission.astype(jnp.float32)
    rng = np.random.default_rng(3)
    img = rng.random((cfg.height, cfg.width, 3)).astype(np.float32)

    sc_, se_, sloss = sstep(color, emission,
                            jnp.asarray([5, 0], jnp.int32),
                            starget_of(img))
    lc_, le_, lloss = lstep(color, emission,
                            jnp.asarray([5 * 7919 + 1, 0], jnp.int32),
                            ltarget_of(img))
    np.testing.assert_allclose(float(sloss), float(lloss), rtol=5e-7)
    np.testing.assert_allclose(np.asarray(sc_), np.asarray(lc_),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(se_), np.asarray(le_),
                               rtol=1e-6, atol=1e-7)


def test_sharded_megakernel_step_descends_cpu_mesh():
    """The sharded fused step on the full (4,2) CPU mesh: gradients are
    psum'd over 'pixels' and pmean'd over 'spp', the loss is finite, and
    a few steps from perturbed colors toward a true-color target
    descend."""
    from pathtracer_tpu.diff.grad import make_sharded_megakernel_step
    from pathtracer_tpu.parallel import make_mesh
    from pathtracer_tpu.render.pallas_grad import make_diff_render

    cfg, sc, arrays, meta, cam_vec, obj, nodes, tris, px, py, pid = \
        _setup(samples=8)
    mesh = make_mesh()  # (4, 2)
    step, target_of = make_sharded_megakernel_step(
        arrays, meta, cfg, sc.camera, mesh, spp=8, tile=TILE, lr=0.3,
        interpret=True)

    color = arrays.color.astype(jnp.float32)
    emission = arrays.emission.astype(jnp.float32)
    # target: the true-color image from the single-device estimator
    # (independent RNG streams -> the minimum is at the true colors only
    # in expectation; the perturbation is large relative to MC noise)
    render = make_diff_render(meta, cfg, 8, cfg.samples, TILE,
                              interpret=True)
    r, g, b = render(color, emission, jnp.asarray([11, 0], jnp.int32),
                     cam_vec, obj, nodes, tris, px, py)
    img = np.zeros((cfg.height, cfg.width, 3), np.float32)
    w = np.asarray(pid) >= 0
    flat = np.asarray(pid).ravel()
    for ch, v in enumerate((r, g, b)):
        np.add.at(img.reshape(-1, 3)[:, ch], flat[w.ravel()],
                  np.asarray(v).ravel()[w.ravel()] / 8.0)
    target = target_of(img)

    c = color.at[1, 0].add(0.4).at[6, 2].add(-0.3)
    losses = []
    for i in range(4):
        c, e, loss = step(c, emission, jnp.asarray([21, 0], jnp.int32),
                          target)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert not np.allclose(np.asarray(c), np.asarray(color.at[1, 0]
                                                     .add(0.4)
                                                     .at[6, 2].add(-0.3)))


def test_tri_grad_batched_spp_fd_cpu_interpret():
    """Per-triangle gradients with MULTIPLE samples per launch (the
    per-(sample, bounce) tape, grad_tiles spp>1) vs central finite
    differences — same common-random-number exactness as the spp=1
    path, one launch instead of four."""
    from pathtracer_tpu.render.pallas_grad import make_diff_render_tri

    cfg, sc, arrays, meta, cam_vec, obj, nodes, tris, px, py, pid = \
        _setup_mesh(samples=4)
    render = make_diff_render_tri(meta, cfg, cfg.samples, TILE,
                                  interpret=True, spp=4)
    color = arrays.color.astype(jnp.float32)
    emission = arrays.emission.astype(jnp.float32)
    tri_color = jnp.asarray(arrays.tri_color, jnp.float32)
    sd = jnp.asarray([40, 0], jnp.int32)

    rng = np.random.default_rng(2)
    wr, wg, wb = (jnp.asarray(rng.random(px.shape), jnp.float32)
                  for _ in range(3))

    def loss(tc):
        r, g, b = render(color, emission, tc, sd, cam_vec, obj,
                         nodes, tris, px, py)
        return jnp.sum(r * wr) + jnp.sum(g * wg) + jnp.sum(b * wb)

    gt = np.asarray(jax.grad(loss)(tri_color))
    assert np.isfinite(gt).all()
    assert np.abs(gt).max() > 0, "no triangle gradient at all"

    flat = np.abs(gt).ravel()
    picks = np.argsort(flat)[-2:]
    h = 2e-3
    for p in picks:
        s, c = divmod(int(p), 3)
        delta = jnp.zeros_like(tri_color).at[s, c].set(h)
        g_fd = float((loss(tri_color + delta)
                      - loss(tri_color - delta)) / (2 * h))
        g_an = float(gt[s, c])
        scale = max(abs(g_fd), abs(g_an), 1e-3)
        assert abs(g_fd - g_an) / scale < 5e-2, (s, c, g_fd, g_an)


def _setup_tex(samples=4):
    """Staged-textured scene (all-file small checkers, nm stripped) for
    the texel-gradient path: every texture stages (pack rules), h<=128
    single-window, piecewise-constant texels."""
    from pathtracer_tpu.render import proctex
    from pathtracer_tpu.render import pallas_kernel as pk

    cfg = RenderConfig(width=32, height=24, samples=samples,
                       samples_per_pass=samples)
    sc = get_scene("textures", cfg)
    for o in sc.objects:
        o.material.textured_nm = False
    mk = lambda d, h, w: np.asarray(proctex.make(("checker", d), h, w)).copy()
    sc.textures = [
        mk((8, (0.9, 0.9, 0.9), (0.2, 0.2, 0.2)), 64, 64),
        mk((8, (0.8, 0.5, 0.3), (0.3, 0.5, 0.8)), 64, 64),
        mk((8, (0.7, 0.7, 0.2), (0.2, 0.7, 0.7)), 64, 64),
        mk((8, (0.5, 0.5, 1.0), (0.5, 1.0, 0.5)), 64, 64),
    ]
    sc.sphere_textures = [
        mk((8, (0.9, 0.6, 0.3), (0.1, 0.3, 0.6)), 64, 128),
        mk((8, (0.8, 0.7, 0.5), (0.4, 0.3, 0.2)), 64, 128),
    ]
    arrays, meta = sc.pack()
    assert pk.staged_lanes(meta) > 0 and pk.supports_scene(meta)
    S, L = TILE
    xs, ys, pid = pk.tile_pixel_layout(cfg.width, cfg.height, S, L)
    px = jnp.asarray(xs)
    py = jnp.asarray(ys)
    cam_vec = jnp.asarray(pk.build_camera_vec(sc.camera))
    obj, nodes, tris = pk.scene_tables_jnp(arrays, meta,
                                           traversal="classic")
    return cfg, sc, arrays, meta, cam_vec, obj, nodes, tris, px, py, pid


def test_tex_grad_fd_cpu_interpret():
    """Staged-atlas texel gradients (make_diff_render_tex: UV tape +
    transposed one-hot scatter, no HBM tape) vs central finite
    differences on the CPU (interpret + software PRNG). The estimator
    is multilinear in texels, so common-random-number central FD is
    near-exact."""
    from pathtracer_tpu.render.pallas_grad import make_diff_render_tex

    cfg, sc, arrays, meta, cam_vec, obj, nodes, tris, px, py, pid = \
        _setup_tex(samples=4)
    render = make_diff_render_tex(meta, cfg, 4, cfg.samples, TILE,
                                  interpret=True)
    seed = jnp.asarray([3, 0], jnp.int32)
    color = arrays.color.astype(jnp.float32)
    emission = arrays.emission.astype(jnp.float32)
    tex = arrays.tex_staged.astype(jnp.float32)

    rng = np.random.default_rng(0)
    wr, wg, wb = (jnp.asarray(rng.random(px.shape), jnp.float32)
                  for _ in range(3))

    def loss(c, e, t):
        r, g, b = render(c, e, t, seed, cam_vec, obj, nodes, tris,
                         px, py)
        return jnp.sum(r * wr) + jnp.sum(g * wg) + jnp.sum(b * wb)

    gc, ge, gt = jax.grad(loss, argnums=(0, 1, 2))(color, emission, tex)
    gc, ge, gt = np.asarray(gc), np.asarray(ge), np.asarray(gt)
    assert np.isfinite(gt).all()
    assert np.abs(gt).max() > 0, "no texel gradient at all"
    # textured objects carry exactly-zero OBJECT-color gradient (the
    # texel overwrites their color in the forward)
    tex_slots = {s for (s, *_r) in meta.obj_tex}
    for j in tex_slots:
        assert np.abs(gc[j]).max() == 0.0, (j, gc[j])
    # emission still flows (area lights)
    assert np.abs(ge).max() > 0

    # FD on the two largest-gradient texels
    flat = np.abs(gt).ravel()
    picks = np.argsort(flat)[-2:]
    h = 2e-3
    for p in picks:
        r_i, l_i = divmod(int(p), gt.shape[1])
        delta = jnp.zeros_like(tex).at[r_i, l_i].set(h)
        g_fd = float((loss(color, emission, tex + delta)
                      - loss(color, emission, tex - delta)) / (2 * h))
        g_an = float(gt[r_i, l_i])
        scale = max(abs(g_fd), abs(g_an), 1e-3)
        assert abs(g_fd - g_an) / scale < 5e-2, (r_i, l_i, g_fd, g_an)


def test_tex_grad_multiwindow_fd_cpu_interpret():
    """Texel gradients through the hb=2 (multi-window) scatter path:
    the `textures-train` scene stages a 256x96 cobblestone spanning two
    atlas lane windows. FD on the largest-gradient texels."""
    from pathtracer_tpu.render import pallas_kernel as pk
    from pathtracer_tpu.render.pallas_grad import make_diff_render_tex

    cfg = RenderConfig(width=24, height=16, samples=2,
                       samples_per_pass=2)
    sc = get_scene("textures-train", cfg)
    arrays, meta = sc.pack()
    assert pk.staged_lanes(meta) > 0 and pk.supports_scene(meta)
    # the scene must actually exercise a multi-window texture
    assert any(isinstance(d, tuple) and d and d[0] == "__staged__"
               and d[3] > 128 for (_s, d, *_r) in meta.obj_tex)
    S, L = TILE
    xs, ys, pid = pk.tile_pixel_layout(cfg.width, cfg.height, S, L)
    px = jnp.asarray(xs)
    py = jnp.asarray(ys)
    cam_vec = jnp.asarray(pk.build_camera_vec(sc.camera))
    obj, nodes, tris = pk.scene_tables_jnp(arrays, meta,
                                           traversal="classic")
    render = make_diff_render_tex(meta, cfg, 2, cfg.samples, TILE,
                                  interpret=True)
    seed = jnp.asarray([11, 0], jnp.int32)
    color = arrays.color.astype(jnp.float32)
    emission = arrays.emission.astype(jnp.float32)
    tex = arrays.tex_staged.astype(jnp.float32)

    rng = np.random.default_rng(5)
    wr, wg, wb = (jnp.asarray(rng.random(px.shape), jnp.float32)
                  for _ in range(3))

    def loss(t):
        r, g, b = render(color, emission, t, seed, cam_vec, obj, nodes,
                         tris, px, py)
        return jnp.sum(r * wr) + jnp.sum(g * wg) + jnp.sum(b * wb)

    gt = np.asarray(jax.grad(loss)(tex))
    assert np.isfinite(gt).all() and np.abs(gt).max() > 0

    flat = np.abs(gt).ravel()
    picks = np.argsort(flat)[-2:]
    h = 2e-3
    for p in picks:
        r_i, l_i = divmod(int(p), gt.shape[1])
        delta = jnp.zeros_like(tex).at[r_i, l_i].set(h)
        g_fd = float((loss(tex + delta) - loss(tex - delta)) / (2 * h))
        g_an = float(gt[r_i, l_i])
        scale = max(abs(g_fd), abs(g_an), 1e-3)
        assert abs(g_fd - g_an) / scale < 5e-2, (r_i, l_i, g_fd, g_an)


def test_tri_grad_onehot_matches_tape():
    """The round-5 on-core one-hot slot scatter (tri_mode='onehot') and
    the round-2b HBM tape + segment-sum (tri_mode='tape') are the same
    mathematical scatter-add — gradients must agree to f32 round-off
    on an identical trajectory."""
    from pathtracer_tpu.render import pallas_kernel as pk
    from pathtracer_tpu.render.pallas_grad import grad_tiles

    cfg, sc, arrays, meta, cam_vec, obj, nodes, tris, px, py, pid = \
        _setup_mesh(samples=2)
    import dataclasses

    meta_nd = dataclasses.replace(meta, tri_uniform_color=None)
    seed = jnp.asarray([9, 0], jnp.int32)
    cot = jnp.ones(px.shape, jnp.float32)
    outs = {}
    for mode in ("onehot", "tape"):
        gcol, gemi, gtri = grad_tiles(
            seed, cam_vec, obj, nodes, tris, px, py, cot, cot, cot,
            meta=meta_nd, cfg=cfg, spp=2, total_samples=cfg.samples,
            tile=TILE, tri_grads=True, interpret=True, tri_mode=mode)
        outs[mode] = (np.asarray(gcol), np.asarray(gemi),
                      np.asarray(gtri))
    for a, b, name in zip(outs["onehot"], outs["tape"],
                          ("gcol", "gemi", "gtri")):
        d = np.abs(a - b).max()
        scale = max(np.abs(b).max(), 1e-6)
        assert d / scale < 1e-5, (name, d, scale)
    assert np.abs(outs["tape"][2]).max() > 0
