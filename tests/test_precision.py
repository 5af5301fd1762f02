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
