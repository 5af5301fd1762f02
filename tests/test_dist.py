"""Distributed rendering tests on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.parallel import make_mesh, mesh_shape_for, render_sharded
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.scene.pack import pack_scene
from pathtracer_tpu.scenes import get_scene


@pytest.fixture(scope="module")
def setup():
    cfg = RenderConfig(width=32, height=24, samples=16, samples_per_pass=8)
    sc = get_scene("reference", cfg)
    arrays, meta = pack_scene(sc.objects)
    return cfg, sc, arrays, meta


def test_mesh_shape():
    assert mesh_shape_for(8) == (4, 2)
    assert mesh_shape_for(1) == (1, 1)
    assert mesh_shape_for(3) == (3, 1)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_render_sharded_runs_and_is_deterministic(setup):
    cfg, sc, arrays, meta = setup
    mesh = make_mesh()
    img1 = render_sharded(arrays, meta, sc.camera, cfg, mesh)
    img2 = render_sharded(arrays, meta, sc.camera, cfg, mesh)
    assert img1.shape == (24, 32, 3)
    assert np.isfinite(img1).all()
    assert np.array_equal(img1, img2)


def test_render_sharded_matches_local_statistically(setup):
    cfg, sc, arrays, meta = setup
    big = cfg.replace(samples=64, samples_per_pass=8)
    mesh = make_mesh()
    img_dist = render_sharded(arrays, meta, sc.camera, big, mesh)
    img_local = render(arrays, meta, sc.camera, big)
    # different RNG streams -> agree in expectation
    assert abs(img_dist.mean() - img_local.mean()) < 0.03
    assert np.abs(img_dist - img_local).mean() < 0.12


def test_render_sharded_pixels_only_mesh(setup):
    cfg, sc, arrays, meta = setup
    mesh = make_mesh(shape=(8, 1))
    img = render_sharded(arrays, meta, sc.camera, cfg, mesh)
    assert np.isfinite(img).all()
    assert 0.05 < img.mean() < 0.6
