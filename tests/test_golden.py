"""Golden-image regression at fixed seed/spp.

What the reference lacks entirely (SURVEY.md §4: its only 'golden history'
is an informal archive of experiment PNGs): a deterministic small render of
the benchmark scene, bit-stable across refactors of the integrator. The
golden is regenerated with:

    PT_WRITE_GOLDENS=1 python -m pytest tests/test_golden.py

(pytest, because conftest.py is what pins the CPU platform — a plain
script import initializes the axon TPU backend first and bakes TPU
numerics into the golden). Any intentional change to the estimator
(sampling order, RNG keying, resolve semantics) must regenerate it.
"""
import os

import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.scenes import get_scene

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "reference.npz")
CFG = dict(width=32, height=24, samples=8, samples_per_pass=4, seed=7)


def _render():
    from pathtracer_tpu.render.integrator import render

    cfg = RenderConfig(**CFG)
    sc = get_scene("reference", cfg)
    arrays, meta = sc.pack()
    return render(arrays, meta, sc.camera, cfg)


def test_reference_golden():
    img = _render()
    if os.environ.get("PT_WRITE_GOLDENS") == "1":
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, img=img)
        pytest.skip(f"golden regenerated: mean={img.mean():.6f}")
    if not os.path.exists(GOLDEN):
        pytest.fail("no golden stored — regenerate with "
                    "PT_WRITE_GOLDENS=1 python -m pytest tests/test_golden.py")
    with np.load(GOLDEN) as z:
        want = z["img"]
    assert img.shape == want.shape
    # identical platform/dtype renders are deterministic; allow small
    # cross-platform float drift
    np.testing.assert_allclose(img, want, atol=2e-5,
                               err_msg=f"mean {img.mean()} vs {want.mean()}")
