"""f32 vs f64 golden cross-check (SURVEY.md §7 'Hard parts': f32 on TPU
with f64 golden verification on CPU — the reference computes in double
throughout its kernel)."""
import jax
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.scenes import get_scene


def test_f32_matches_f64_golden():
    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    try:
        import jax.numpy as jnp

        cfg32 = RenderConfig(width=24, height=18, samples=16,
                             samples_per_pass=8)
        sc = get_scene("reference", cfg32)
        a32, m32 = sc.pack(dtype=jnp.float32)
        img32 = render(a32, m32, sc.camera, cfg32)

        cfg64 = cfg32.replace(dtype="float64")
        a64, m64 = sc.pack(dtype=jnp.float64)
        img64 = render(a64, m64, sc.camera, cfg64)

        assert img64.dtype == np.float32  # output is always f32
        assert np.isfinite(img64).all()
        # identical estimator, identical uniforms (drawn in f32 in both
        # precisions by design, integrator.py bounce_step) — the images
        # differ only by accumulated rounding
        assert abs(img32.mean() - img64.mean()) < 5e-3
        assert np.abs(img32 - img64).mean() < 0.02
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
@pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                    reason="needs a TPU device")
def test_f64_render_on_tpu_matches_cpu_golden(tmp_path):
    """Device-side f64 rendering ON THE TPU (the reference computes in
    double throughout its kernel, tracer.cl; README.md:50-59 documents
    its fp64 device quirks). XLA:TPU emulates f64 — slow but exact
    enough that the same threefry streams + deterministic math give a
    render identical (at the .raw format's f32 precision) to the CPU
    f64 golden. Subprocess-isolated because jax_enable_x64 is a
    process-global flag."""
    import os
    import subprocess
    import sys

    from pathtracer_tpu.io.raw import read_raw

    def render_to(raw_path, platform_env):
        env = dict(os.environ, **platform_env)
        cmd = [sys.executable, "-m", "pathtracer_tpu",
               "--scene", "reference", "--dtype", "float64",
               "--width", "48", "--height", "32",
               "--samples", "4", "--samples-per-pass", "4",
               "--output", str(raw_path) + ".png",
               "--raw-output", str(raw_path)]
        subprocess.run(cmd, check=True, env=env, timeout=540,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
        return np.asarray(read_raw(str(raw_path)), np.float64)

    tpu = render_to(tmp_path / "tpu.raw", {})
    cpu = render_to(tmp_path / "cpu.raw", {"JAX_PLATFORMS": "cpu"})
    assert np.isfinite(tpu).all()
    assert np.array_equal(tpu, cpu), (
        f"f64 TPU render != CPU f64 golden (max diff "
        f"{np.abs(tpu - cpu).max()})")
