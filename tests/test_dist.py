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


def test_render_sharded_pallas_matches_local(setup):
    """The distributed MEGAKERNEL (shard_map over ('pixels','spp') with
    the Pallas kernel per shard) on the CPU mesh via interpret mode +
    the software PRNG; statistical parity with the local wavefront."""
    from pathtracer_tpu.parallel.render_dist import render_sharded_pallas

    cfg, sc, arrays, meta = setup
    big = cfg.replace(samples=32, samples_per_pass=8)
    mesh = make_mesh()
    img = render_sharded_pallas(arrays, meta, sc.camera, big, mesh,
                                interpret=True)
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all() and img.min() >= 0.0
    img_local = render(arrays, meta, sc.camera, big)
    assert abs(img.mean() - img_local.mean()) < 0.05
    # independent RNG streams at 32 spp: per-pixel MAD is MC noise
    assert np.abs(img - img_local).mean() < 0.2


def test_render_sharded_pallas_textured(setup):
    """Distributed megakernel on a TEXTURED scene (computed texels under
    shard_map): same estimator as the local wavefront."""
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.parallel.render_dist import render_sharded_pallas
    from pathtracer_tpu.scenes import get_scene

    cfg = RenderConfig(width=32, height=24, samples=16,
                       samples_per_pass=16)
    import jax

    sc = get_scene("textures", cfg)
    arrays, meta = sc.pack()
    mesh = make_mesh(devices=jax.devices()[:4], shape=(2, 2))
    img = render_sharded_pallas(arrays, meta, sc.camera, cfg, mesh,
                                interpret=True)
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all() and img.min() >= 0.0
    img_local = render(arrays, meta, sc.camera, cfg)
    assert abs(img.mean() - img_local.mean()) < 0.05
    assert np.abs(img - img_local).mean() < 0.25


def test_render_sharded_pixels_only_mesh(setup):
    cfg, sc, arrays, meta = setup
    mesh = make_mesh(shape=(8, 1))
    img = render_sharded(arrays, meta, sc.camera, cfg, mesh)
    assert np.isfinite(img).all()
    assert 0.05 < img.mean() < 0.6


def test_driver_with_mesh_matches_local_statistically(setup):
    """render_driver(mesh=...) — the unified distributed path — agrees
    with the single-device driver in expectation, and populates stats."""
    from pathtracer_tpu.driver import render_driver

    cfg, sc, arrays, meta = setup
    big = cfg.replace(samples=64, samples_per_pass=8)
    mesh = make_mesh()
    img_dist, stats = render_driver(arrays, meta, sc.camera, big,
                                    mesh=mesh)
    img_local, _ = render_driver(arrays, meta, sc.camera, big)
    assert img_dist.shape == (24, 32, 3)
    assert stats.backend == "wavefront@4x2"
    assert stats.samples == 32 * 24 * 64
    assert stats.segments >= 1
    assert abs(img_dist.mean() - img_local.mean()) < 0.03
    assert np.abs(img_dist - img_local).mean() < 0.15
    # the unified driver path IS render_sharded's estimator, bit-exactly
    # (same RNG stream layout) — plus checkpoints/recovery/stats on top
    img_sharded = render_sharded(arrays, meta, sc.camera, big, mesh)
    np.testing.assert_array_equal(img_dist, img_sharded)


def test_driver_with_mesh_checkpoint_resume(tmp_path, setup, monkeypatch):
    """Checkpoint/resume is bit-identical under distribution (VERDICT
    round-1: the distributed path used to forfeit the driver entirely)."""
    from pathtracer_tpu.driver import render_driver

    cfg, sc, arrays, meta = setup
    cfg = cfg.replace(samples=32)          # 4 chunks of 8 spp
    mesh = make_mesh()
    ck = str(tmp_path / "ck.npz")

    img_full, _ = render_driver(arrays, meta, sc.camera, cfg, mesh=mesh,
                                checkpoint_path=None, checkpoint_every=2)

    # interrupted run: fault injection exhausts retries at chunk 2, AFTER
    # the first 2-chunk segment checkpointed
    monkeypatch.setenv("PT_FAULT_INJECT", "2")
    monkeypatch.setenv("PT_FAULT_COUNT", "99")
    monkeypatch.setenv("PT_MAX_RETRIES", "0")
    with pytest.raises(Exception):
        render_driver(arrays, meta, sc.camera, cfg, mesh=mesh,
                      checkpoint_path=ck, checkpoint_every=2)
    monkeypatch.delenv("PT_FAULT_INJECT")
    monkeypatch.delenv("PT_FAULT_COUNT")
    monkeypatch.delenv("PT_MAX_RETRIES")

    img_resumed, stats = render_driver(
        arrays, meta, sc.camera, cfg, mesh=mesh,
        checkpoint_path=ck, checkpoint_every=2, resume=True)
    # resume picked up mid-render, not from scratch
    assert stats.samples < 32 * 24 * 32
    np.testing.assert_array_equal(img_full, img_resumed)


def test_driver_with_mesh_recovers_from_fault(setup, monkeypatch):
    from pathtracer_tpu.driver import render_driver

    cfg, sc, arrays, meta = setup
    mesh = make_mesh()
    img_ok, _ = render_driver(arrays, meta, sc.camera, cfg, mesh=mesh)
    monkeypatch.setenv("PT_FAULT_INJECT", "1")
    img_rec, stats = render_driver(arrays, meta, sc.camera, cfg,
                                   mesh=mesh)
    assert stats.recoveries == 1
    np.testing.assert_array_equal(img_ok, img_rec)


def test_render_sharded_pallas_rounds_spp_up(setup, monkeypatch):
    """Non-divisible sample budgets must round the per-shard spp UP
    (driver.py behavior), not floor it: samples=5 over a 2-way 'spp'
    axis must deliver >= 5 samples (3 per shard), not 4."""
    from pathtracer_tpu.parallel.render_dist import render_sharded_pallas
    from pathtracer_tpu.render import pallas_kernel as pk

    cfg, sc, arrays, meta = setup
    captured = {}
    real = pk.trace_tiles

    def spy(seed, cam, obj, nodes, tris, px, py, **kw):
        captured["spp"] = kw["spp"]
        return real(seed, cam, obj, nodes, tris, px, py, **kw)

    # render_sharded_pallas resolves pk.trace_tiles at call time
    monkeypatch.setattr(pk, "trace_tiles", spy)
    mesh = make_mesh()  # (4, 2): spp axis size 2
    odd = cfg.replace(samples=5, samples_per_pass=8)
    img = render_sharded_pallas(arrays, meta, sc.camera, odd, mesh,
                                interpret=True)
    assert captured["spp"] == 3       # ceil(5 / 2), was floor -> 2
    assert np.isfinite(img).all()
