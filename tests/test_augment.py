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


# ---------------------------------------------------------------------------
# new groups: lumaflip / hue / saturation / imgfilter / noise / cutout
# (ref augment.py:330-453)
# ---------------------------------------------------------------------------

_LUMA3 = np.ones(3) / np.sqrt(3)


def test_lumaflip_is_householder_or_identity():
    pipe = AugmentPipe(lumaflip=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 3))
    y = pipe(x, jax.random.PRNGKey(2), p=1.0)
    xr = np.asarray(x).reshape(8, -1, 3)
    yr = np.asarray(y).reshape(8, -1, 3)
    # reflection about the luma axis: c' = c - (2/3) * sum(c)
    refl = xr - (2.0 / 3.0) * xr.sum(-1, keepdims=True)
    for b in range(8):
        d_id = np.abs(yr[b] - xr[b]).max()
        d_fl = np.abs(yr[b] - refl[b]).max()
        assert min(d_id, d_fl) < 1e-5


def test_hue_rotation_preserves_luma_and_chroma_norm():
    pipe = AugmentPipe(hue=1)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 4, 4, 3))
    y = pipe(x, jax.random.PRNGKey(4), p=1.0)
    xr, yr = np.asarray(x), np.asarray(y)
    luma_x = xr @ _LUMA3
    luma_y = yr @ _LUMA3
    np.testing.assert_allclose(luma_y, luma_x, atol=1e-5)
    chroma_x = xr - luma_x[..., None] * _LUMA3
    chroma_y = yr - luma_y[..., None] * _LUMA3
    np.testing.assert_allclose(
        np.linalg.norm(chroma_y, axis=-1), np.linalg.norm(chroma_x, axis=-1),
        atol=1e-5)
    assert np.abs(yr - xr).max() > 1e-3  # it did rotate


def test_saturation_preserves_luma_component():
    pipe = AugmentPipe(saturation=1)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 4, 4, 3))
    y = pipe(x, jax.random.PRNGKey(6), p=1.0)
    np.testing.assert_allclose(
        np.asarray(y) @ _LUMA3, np.asarray(x) @ _LUMA3, atol=1e-5)


def test_imgfilter_zero_std_is_identity():
    """With imgfilter_std=0 every band gain is 1, so the combined filter is
    the perfect-reconstruction delta of the sym2 bank (validates the
    filter-bank construction, ref :186-195)."""
    pipe = AugmentPipe(imgfilter=1, imgfilter_std=0.0)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 16, 3))
    y = pipe(x, jax.random.PRNGKey(8), p=1.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_imgfilter_amplifies_bands():
    pipe = AugmentPipe(imgfilter=1, imgfilter_std=2.0)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 16, 3))
    y = pipe(x, jax.random.PRNGKey(10), p=1.0)
    assert np.isfinite(np.asarray(y)).all()
    assert np.abs(np.asarray(y) - np.asarray(x)).max() > 1e-3


def test_noise_adds_noise():
    pipe = AugmentPipe(noise=1, noise_std=0.5)
    x = jnp.zeros((4, 8, 8, 3))
    y = np.asarray(pipe(x, jax.random.PRNGKey(11), p=1.0))
    assert np.abs(y).max() > 1e-3
    assert np.isfinite(y).all()


def test_cutout_zeroes_a_rectangle():
    pipe = AugmentPipe(cutout=1, cutout_size=0.5)
    x = jnp.ones((8, 16, 16, 3))
    y = np.asarray(pipe(x, jax.random.PRNGKey(12), p=1.0))
    frac_zero = (y == 0).mean(axis=(1, 2, 3))
    assert (frac_zero > 0).all()          # every image got a cutout
    assert (frac_zero <= 0.26).all()      # at most a 0.5x0.5 rectangle


def test_new_groups_p_zero_identity():
    pipe = AugmentPipe(lumaflip=1, hue=1, saturation=1, imgfilter=1,
                       noise=1, cutout=1)
    x = jax.random.normal(jax.random.PRNGKey(13), (2, 8, 8, 3))
    y = pipe(x, jax.random.PRNGKey(14), p=0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)
