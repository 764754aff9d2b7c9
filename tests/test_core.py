import jax.numpy as jnp
import numpy as np

from apde_mvs_tpu.core import checkerboard as cb
from apde_mvs_tpu.core import sampling


def test_checkerboard_roundtrip():
    rng = np.random.default_rng(0)
    arr = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
    for color in (cb.BLACK, cb.RED):
        vals = cb.gather_color(arr, color)
        assert vals.shape == (6, 4)
        out = cb.scatter_color(jnp.zeros_like(arr), vals, color)
        mask = np.asarray(cb.color_mask(6, 8, color))
        np.testing.assert_array_equal(np.asarray(out)[mask], np.asarray(arr)[mask])
        np.testing.assert_array_equal(np.asarray(out)[~mask], 0)
    # colors partition the grid
    m0 = np.asarray(cb.color_mask(6, 8, 0))
    m1 = np.asarray(cb.color_mask(6, 8, 1))
    assert np.all(m0 ^ m1)


def test_checkerboard_coords():
    xs, ys = cb.color_coords(6, 8, cb.BLACK)
    xs, ys = np.asarray(xs), np.asarray(ys)
    assert np.all((xs + ys) % 2 == 0)
    xs, ys = cb.color_coords(6, 8, cb.RED)
    assert np.all((np.asarray(xs) + np.asarray(ys)) % 2 == 1)


def test_checkerboard_multichannel():
    rng = np.random.default_rng(1)
    arr = jnp.asarray(rng.normal(size=(4, 6, 4)).astype(np.float32))
    vals = cb.gather_color(arr, cb.RED)
    assert vals.shape == (4, 3, 4)
    out = cb.scatter_color(arr, vals * 2, cb.RED)
    mask = np.asarray(cb.color_mask(4, 6, cb.RED))
    np.testing.assert_allclose(np.asarray(out)[mask], np.asarray(arr)[mask] * 2)
    np.testing.assert_allclose(np.asarray(out)[~mask], np.asarray(arr)[~mask])


def test_bilinear_sampling_matches_manual():
    rng = np.random.default_rng(2)
    img = rng.normal(size=(9, 13)).astype(np.float32)
    jimg = jnp.asarray(img)
    quad = sampling.pack_bilinear(jimg)
    xs = jnp.asarray(rng.uniform(0, 12, size=(50,)), jnp.float32)
    ys = jnp.asarray(rng.uniform(0, 8, size=(50,)), jnp.float32)
    a = np.asarray(sampling.bilinear_sample(jimg, xs, ys))
    b = np.asarray(sampling.bilinear_sample_packed(quad, 13, 9, xs, ys))
    # manual oracle
    xs_n, ys_n = np.asarray(xs), np.asarray(ys)
    x0 = np.floor(xs_n).astype(int)
    y0 = np.floor(ys_n).astype(int)
    fx, fy = xs_n - x0, ys_n - y0
    x1 = np.minimum(x0 + 1, 12)
    y1 = np.minimum(y0 + 1, 8)
    oracle = (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
              + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)
    np.testing.assert_allclose(a, oracle, atol=1e-5)
    np.testing.assert_allclose(b, oracle, atol=1e-5)


def test_sampling_clamps_at_edges():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    quad = sampling.pack_bilinear(img)
    xs = jnp.asarray([-5.0, 10.0])
    ys = jnp.asarray([-3.0, 7.0])
    out = np.asarray(sampling.bilinear_sample_packed(quad, 4, 3, xs, ys))
    np.testing.assert_allclose(out, [0.0, 11.0])


def test_texel_fetch_truncates():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    out = np.asarray(sampling.texel_fetch(
        img, jnp.asarray([0.9, 2.1, -1.0]), jnp.asarray([0.9, 1.7, 5.0])))
    np.testing.assert_allclose(out, [0.0, 6.0, 8.0])


def test_fetch_fill():
    arr = jnp.asarray(np.arange(12, dtype=np.int32).reshape(3, 4))
    out = np.asarray(sampling.fetch(
        arr, jnp.asarray([0, 4, 2]), jnp.asarray([0, 1, -1]), fill=-7))
    np.testing.assert_array_equal(out, [0, -7, -7])
