"""ADA augmentation pipeline tests (ref lib/data/augment.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from threedhumangan_tpu.data.augment import AugmentPipe, grid_sample_bilinear


def _pipe():
    # the shipped config's knob set (configs/map3d.py:78-79)
    return AugmentPipe(xflip=1, rotate90=0, rotate_max=0.05, xint=0,
                       scale=1, rotate=1, aniso=1, xfrac=0,
                       brightness=1, contrast=1, saturation=1)


def test_p_zero_is_identity(rng):
    pipe = _pipe()
    x = jax.random.normal(rng, (2, 8, 8, 3))
    y = pipe(x, rng, p=0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_p_one_changes_images(rng):
    pipe = _pipe()
    x = jax.random.normal(rng, (4, 8, 8, 3))
    y = pipe(x, rng, p=1.0)
    assert np.abs(np.asarray(y) - np.asarray(x)).max() > 1e-3
    assert np.isfinite(np.asarray(y)).all()


def test_augment_is_differentiable(rng):
    # ADA must backprop into the generator's fake images
    pipe = _pipe()
    x = jax.random.normal(rng, (2, 8, 8, 3))
    g = jax.grad(lambda im: jnp.sum(pipe(im, rng, p=1.0) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_xflip_only():
    pipe = AugmentPipe(xflip=1)
    x = jnp.arange(2 * 4 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 4, 1)
    y = pipe(x, jax.random.PRNGKey(0), p=1.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x[:, :, ::-1, :]), atol=1e-6)


def test_grid_sample_identity(rng):
    x = jax.random.normal(rng, (1, 6, 5, 2))
    ys = jnp.linspace(-1, 1, 6)
    xs = jnp.linspace(-1, 1, 5)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    grid = jnp.stack([gx, gy], -1)[None]
    y = grid_sample_bilinear(x, grid)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_grid_sample_zero_padding(rng):
    x = jnp.ones((1, 4, 4, 1))
    grid = jnp.full((1, 2, 2, 2), 5.0)  # far outside
    y = grid_sample_bilinear(x, grid)
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-6)
