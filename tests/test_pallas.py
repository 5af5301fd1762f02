"""Pallas megakernel: interpret-mode correctness on the CPU mesh.

The megakernel (render/pallas_kernel.py) uses a different RNG than the
wavefront integrator (on-core PRNG vs threefry), so parity is statistical:
same mean image at matched spp, not bitwise (same policy the reference
forces on us for the OpenCL kernel's wall-clock-seeded sin-hash,
tracer.cl:314).
"""
import jax
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.pallas_kernel import render_pallas, supports_scene
from pathtracer_tpu.scenes import get_scene

# The kernel's on-core PRNG (pltpu.prng_*) has no CPU lowering and the
# TPU-interpret path hangs on the CPU backend, so the render-parity tests
# only run when a real TPU is visible (the CI conftest pins JAX to CPU;
# run `python -m pytest tests/test_pallas.py` without it on a TPU host).
_tpu = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs a TPU device"
)


@pytest.fixture(scope="module")
def small_cfg():
    return RenderConfig(width=32, height=24, samples=64, samples_per_pass=64)


def test_supports_scene_classification(small_cfg):
    checks = {
        "reference": True,          # planes + spheres
        "transparency": True,       # + glass/mirror roulette
        "default": True,            # triangle group (packet traversal)
        "teapot": True,             # BVH mesh
        "textures": False,          # textured materials -> wavefront
        "cubemap": False,           # cube-map texture -> wavefront
    }
    for name, expect in checks.items():
        sc = get_scene(name, small_cfg)
        _, meta = sc.pack()
        assert supports_scene(meta) == expect, name


@_tpu
def test_megakernel_matches_wavefront_mean(small_cfg):
    from pathtracer_tpu.render.integrator import render

    sc = get_scene("reference", small_cfg)
    arrays, meta = sc.pack()
    img_p = render_pallas(arrays, meta, sc.camera, small_cfg,
                          tile=(8, 128))
    img_w = render(arrays, meta, sc.camera, small_cfg)

    assert np.isfinite(img_p).all()
    assert img_p.min() >= 0.0
    # independent-RNG estimates of the same integral: means agree
    assert abs(img_p.mean() - img_w.mean()) < 0.03
    # and so do per-pixel values up to MC noise at 64 spp
    assert np.abs(img_p - img_w).mean() < 0.15


@_tpu
def test_megakernel_mesh_matches_wavefront_mean(small_cfg):
    """BVH packet-traversal path vs the CPU wavefront oracle (the
    wavefront BVH on real TPU hardware is watchdog-limited, so the oracle
    runs on the CPU backend)."""
    import jax

    from pathtracer_tpu.render.integrator import render

    sc = get_scene("teapot", small_cfg)
    arrays, meta = sc.pack()
    img_p = render_pallas(arrays, meta, sc.camera, small_cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        arrays2, meta2 = sc.pack()
        img_w = render(arrays2, meta2, sc.camera, small_cfg)
    assert np.isfinite(img_p).all()
    assert abs(img_p.mean() - img_w.mean()) < 0.03
    assert np.abs(img_p - img_w).mean() < 0.15


@_tpu
def test_wavefront_pallas_intersect_matches_cpu_oracle(small_cfg):
    """The wavefront integrator's pallas intersect kernel (used for mesh
    scenes on real TPUs) must agree with the pure-XLA walk: identical RNG
    streams, so the images match to f32 rounding."""
    import jax

    from pathtracer_tpu.render.integrator import render

    sc = get_scene("teapot", small_cfg)
    arrays, meta = sc.pack()
    img_t = render(arrays, meta, sc.camera, small_cfg)  # pallas intersect
    with jax.default_device(jax.devices("cpu")[0]):
        a2, m2 = sc.pack()
        img_c = render(a2, m2, sc.camera, small_cfg)    # XLA walk
    assert np.isfinite(img_t).all()
    assert np.abs(img_t - img_c).mean() < 5e-3


@_tpu
def test_megakernel_deterministic_per_seed(small_cfg):
    sc = get_scene("reference", small_cfg)
    arrays, meta = sc.pack()
    a = render_pallas(arrays, meta, sc.camera, small_cfg, seed=5,
                      tile=(8, 128))
    b = render_pallas(arrays, meta, sc.camera, small_cfg, seed=5,
                      tile=(8, 128))
    c = render_pallas(arrays, meta, sc.camera, small_cfg, seed=6,
                      tile=(8, 128))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
