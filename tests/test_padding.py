"""Boundary-padding parity tests (reference: tests/test_bondary_padding.py —
earth/mirror pad + unpad invertibility, plus exact value checks of the
180-degree-roll pole continuation)."""

import jax.numpy as jnp
import numpy as np

from credit_tpu.ops.padding import TensorPadding, earth_pad, mirror_pad, unpad


def _x(rng, shape=(2, 1, 10, 16, 3)):
    return jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)


def test_earth_pad_unpad_roundtrip(rng):
    x = _x(rng)
    p = TensorPadding("earth", (3, 3), (4, 4))
    y = p.pad(x)
    assert y.shape == (2, 1, 16, 24, 3)
    np.testing.assert_array_equal(np.asarray(p.unpad(y)), np.asarray(x))


def test_mirror_pad_unpad_roundtrip(rng):
    x = _x(rng)
    p = TensorPadding("mirror", (2, 2), (3, 3))
    y = p.pad(x)
    assert y.shape == (2, 1, 14, 22, 3)
    np.testing.assert_array_equal(np.asarray(p.unpad(y)), np.asarray(x))


def test_earth_pole_rows_are_rolled_flip(rng):
    x = _x(rng, (1, 1, 6, 8, 1))
    y = earth_pad(x, (2, 2), (0, 0))
    xn = np.asarray(x)[0, 0, :, :, 0]
    yn = np.asarray(y)[0, 0, :, :, 0]
    rolled = np.roll(xn, 4, axis=-1)  # 180 deg shift (nlon//2)
    # top pad rows: flipped first rows of the rolled field
    np.testing.assert_array_equal(yn[0], rolled[1])
    np.testing.assert_array_equal(yn[1], rolled[0])
    # bottom pad rows: flipped last rows of the rolled field
    np.testing.assert_array_equal(yn[-1], rolled[-2])
    np.testing.assert_array_equal(yn[-2], rolled[-1])


def test_lon_pad_is_circular(rng):
    x = _x(rng, (1, 1, 4, 8, 1))
    y = earth_pad(x, (0, 0), (2, 3))
    xn = np.asarray(x)[0, 0]
    yn = np.asarray(y)[0, 0]
    np.testing.assert_array_equal(yn[:, :2], xn[:, -2:])
    np.testing.assert_array_equal(yn[:, -3:], xn[:, :3])


def test_mirror_reflect_excludes_edge(rng):
    x = _x(rng, (1, 1, 5, 6, 1))
    y = mirror_pad(x, (2, 2), (0, 0))
    xn = np.asarray(x)[0, 0]
    yn = np.asarray(y)[0, 0]
    np.testing.assert_array_equal(yn[0], xn[2])
    np.testing.assert_array_equal(yn[1], xn[1])
    np.testing.assert_array_equal(yn[-1], xn[-3])


def test_unpad_function(rng):
    x = _x(rng, (1, 1, 9, 11, 2))
    np.testing.assert_array_equal(
        np.asarray(unpad(x, (2, 3), (1, 4))), np.asarray(x)[:, :, 2:-3, 1:-4]
    )
