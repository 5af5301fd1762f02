"""UV mapping tests (reference tables: shapes/sphericalmap_test.go,
shapes/cubemap_test.go)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracer_tpu.render.uv import cube_uv, sample_texture, spherical_map


@pytest.mark.parametrize(
    "p,expected",
    [
        ((0, 0, -1), (0.0, 0.5)),
        ((1, 0, 0), (0.25, 0.5)),
        ((0, 0, 1), (0.5, 0.5)),
        ((-1, 0, 0), (0.75, 0.5)),
        ((0, 1, 0), (0.5, 1.0)),
        ((0, -1, 0), (0.5, 0.0)),
        ((np.sqrt(2) / 2, np.sqrt(2) / 2, 0), (0.25, 0.75)),
    ],
)
def test_spherical_map_table(p, expected):
    uv = jax.jit(spherical_map)(jnp.asarray([p], jnp.float32))
    assert np.allclose(np.asarray(uv)[0], expected, atol=1e-5)


@pytest.mark.parametrize(
    "p,u_range,v_range",
    [
        ((1, 0, 0), (0.5, 0.75), (1/3, 2/3)),    # right
        ((-1, 0, 0), (0.0, 0.25), (1/3, 2/3)),   # left
        ((0, 1, 0), (0.25, 0.5), (2/3, 1.0)),    # top
        ((0, -1, 0), (0.25, 0.5), (0.0, 1/3)),   # bottom
        ((0, 0, 1), (0.25, 0.5), (1/3, 2/3)),    # front
        ((0, 0, -1), (0.75, 1.0), (1/3, 2/3)),   # back
    ],
)
def test_cube_uv_face_regions(p, u_range, v_range):
    uv = np.asarray(jax.jit(cube_uv)(jnp.asarray([p], jnp.float32)))[0]
    assert u_range[0] <= uv[0] <= u_range[1], uv
    assert v_range[0] <= uv[1] <= v_range[1], uv


def test_cube_uv_front_center():
    # front face center: u = 0.25 + 0.5*0.25 = 0.375, v = 2/3 - 0.5/3 = 0.5
    uv = np.asarray(jax.jit(cube_uv)(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)))[0]
    assert np.allclose(uv, [0.375, 0.5], atol=1e-4)


def test_sample_texture_bilinear_wrap():
    atlas = np.zeros((1, 2, 2, 3), np.float32)
    atlas[0, 0, 0] = [1, 0, 0]
    atlas[0, 0, 1] = [0, 1, 0]
    atlas[0, 1, 0] = [0, 0, 1]
    atlas[0, 1, 1] = [1, 1, 1]
    at = jnp.asarray(atlas)
    f = jax.jit(lambda u, v: sample_texture(
        at, jnp.zeros_like(u, jnp.int32), u, v))
    # texel centers: (0.25, 0.25) -> exact texel values
    out = np.asarray(f(jnp.asarray([0.25], jnp.float32), jnp.asarray([0.25], jnp.float32)))
    assert np.allclose(out[0], [1, 0, 0], atol=1e-6)
    # midpoint: average of all four
    out = np.asarray(f(jnp.asarray([0.5], jnp.float32), jnp.asarray([0.5], jnp.float32)))
    assert np.allclose(out[0], [0.5, 0.5, 0.5], atol=1e-6)
    # wrap: u=1.25 == u=0.25
    out = np.asarray(f(jnp.asarray([1.25], jnp.float32), jnp.asarray([0.25], jnp.float32)))
    assert np.allclose(out[0], [1, 0, 0], atol=1e-6)


def test_sample_texture_repeat_negative():
    atlas = np.zeros((1, 1, 4, 3), np.float32)
    atlas[0, 0, :, 0] = [0.0, 0.25, 0.5, 0.75]
    at = jnp.asarray(atlas)
    f = jax.jit(lambda u, v: sample_texture(
        at, jnp.zeros_like(u, jnp.int32), u, v))
    a = np.asarray(f(jnp.asarray([-0.875], jnp.float32), jnp.asarray([0.5], jnp.float32)))
    b = np.asarray(f(jnp.asarray([0.125], jnp.float32), jnp.asarray([0.5], jnp.float32)))
    assert np.allclose(a, b, atol=1e-6)
