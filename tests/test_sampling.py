"""Sampling math tests (schlick tables from the 'Ray Tracer Challenge'
examples the reference implements, tracer.cl:485-505)."""
import numpy as np
import jax
import jax.numpy as jnp

from pathtracer_tpu.render.sampling import (
    random_vector_in_hemisphere, refracted_direction, schlick, sunflower,
)


def _sch(eye, normal, n1, n2):
    f = jax.jit(lambda e, n: schlick(e, n, n1, n2))
    return float(np.asarray(f(jnp.asarray([eye], jnp.float32),
                               jnp.asarray([normal], jnp.float32)))[0])


def test_schlick_total_internal_reflection():
    # glass->air at 45deg beyond critical angle -> 1.0
    s2 = np.sqrt(2) / 2
    val = _sch([0, -1, 0], [0, -s2, s2], 1.5, 1.0)
    # the geometry here gives cos small; TIR when sin2t > 1
    assert 0.0 <= val <= 1.0
    # canonical TIR case: eye straight along normal? choose grazing:
    val = _sch([0, 1, 0], [1, 0, 0], 1.5, 1.0)  # cos=0 -> sin2t>1 -> 1.0
    assert val == 1.0


def test_schlick_perpendicular():
    # normal incidence air->glass n=1.5: r0 = ((1-1.5)/(2.5))^2 = 0.04
    val = _sch([0, 1, 0], [0, 1, 0], 1.0, 1.5)
    assert np.isclose(val, 0.04, atol=1e-5)


def test_schlick_small_angle_n2_gt_n1():
    # book example: eye (0, 0.99, sqrt(1-0.99^2)...) approximate check range
    val = _sch([0, 0.6, 0.8], [0, 1, 0], 1.0, 1.52)
    assert 0.04 < val < 1.0


def test_refracted_direction_straight_through():
    # n1 == n2 -> direction = n*(cos_i*1 - cos_t) - eye = -eye when ratios 1
    eye = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    d = np.asarray(jax.jit(lambda e, nn: refracted_direction(e, nn, 1.0, 1.0))(eye, n))
    assert np.allclose(d[0], [0, -1, 0], atol=1e-6)


def test_refracted_direction_snell():
    # 45 degrees air->glass(1.5): sin_t = sin(45)/1.5
    s2 = np.sqrt(2) / 2
    eye = jnp.asarray([[0.0, s2, -s2]], jnp.float32)  # eye vec away from surface
    n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    d = np.asarray(jax.jit(lambda e, nn: refracted_direction(e, nn, 1.0, 1.5))(eye, n))[0]
    sin_t = np.linalg.norm([d[0], d[2]]) / np.linalg.norm(d)
    assert np.isclose(sin_t, s2 / 1.5, atol=1e-5)
    assert d[1] < 0  # transmitted into the surface


def test_hemisphere_upper_and_unit():
    rng = np.random.default_rng(0)
    N = 512
    u1 = jnp.asarray(rng.random(N, ).astype(np.float32))
    u2 = jnp.asarray(rng.random(N).astype(np.float32))
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], jnp.float32), (N, 3))
    d = np.asarray(jax.jit(random_vector_in_hemisphere)(n, u1, u2))
    dots = d @ np.array([0, 0, -1.0])
    assert (dots >= -1e-6).all()
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)


def test_sunflower_within_disc():
    idx = jnp.arange(1, 501, dtype=jnp.float32)
    x, y = jax.jit(lambda i: sunflower(500, 2.0, i))(idx)
    r = np.hypot(np.asarray(x), np.asarray(y))
    assert (r <= 1.0 + 1e-5).all()
    # boundary points land on the rim
    assert np.isclose(r[-1], 1.0, atol=1e-5)
