"""Next-event estimation (cfg.nee) — the reference's experimental
explicit-light-sampling path (tracer.cl:786-829, shipped disabled)."""
import numpy as np

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.scenes import get_scene


def test_nee_runs_and_brightens_diffuse():
    cfg = RenderConfig(width=24, height=18, samples=16, samples_per_pass=8)
    sc = get_scene("reference", cfg)
    arrays, meta = sc.pack()
    assert meta.light_indices == (0,)  # the flattened sphere light

    base = render(arrays, meta, sc.camera, cfg)
    nee = render(arrays, meta, sc.camera, cfg.replace(nee=True))
    assert np.isfinite(nee).all()
    # NEE adds direct-light contributions on top of the path estimator
    # (the reference's version double-counts by design — it keeps the
    # emission-on-hit path too)
    assert nee.mean() > base.mean()
    # same scene visibility: wall hit pattern unchanged
    assert (nee > 0).sum() >= (base > 0).sum()


def test_light_indices_static():
    cfg = RenderConfig(width=8, height=8, samples=1)
    for name, n_lights in [("reference", 1), ("transparency_quad_lights", 4),
                           ("transparency_f_light", 3)]:
        sc = get_scene(name, cfg)
        _, meta = sc.pack()
        assert len(meta.light_indices) == n_lights, name
