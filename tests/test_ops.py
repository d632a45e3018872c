"""Op-library tests vs slow numpy oracles (SURVEY.md §4: the reference's
`_*_ref` implementations are the spec; these oracles re-state that spec)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threedhumangan_tpu import ops


# ---------------------------------------------------------------------------
# bias_act
# ---------------------------------------------------------------------------


def test_bias_act_linear_bias_only(rng):
    x = jax.random.normal(rng, (2, 5, 7))
    b = jnp.arange(7.0)
    y = ops.bias_act(x, b, axis=-1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) + np.arange(7.0), rtol=1e-6)


def test_bias_act_lrelu_gain_clamp(rng):
    x = jax.random.normal(rng, (4, 8)) * 3
    y = ops.bias_act(x, None, act="lrelu", alpha=0.2, gain=2.0, clamp=1.5)
    xr = np.asarray(x)
    expected = np.where(xr >= 0, xr, 0.2 * xr) * 2.0
    expected = np.clip(expected, -1.5, 1.5)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-6)


def test_bias_act_default_gains():
    assert ops.activation_funcs["lrelu"].def_gain == pytest.approx(np.sqrt(2))
    assert ops.activation_funcs["linear"].def_gain == 1.0


def test_bias_act_second_order_grad():
    # JAX-native arbitrary-order AD replaces the reference's custom grad
    # kernels (bias_act.py:126-207).
    f = lambda x: jnp.sum(ops.bias_act(x, None, act="softplus") ** 2)
    x = jnp.ones((3,))
    hess = jax.hessian(f)(x)
    assert np.isfinite(np.asarray(hess)).all()


# ---------------------------------------------------------------------------
# upfirdn2d oracle
# ---------------------------------------------------------------------------


def upfirdn2d_oracle(x_nhwc, f, up=1, down=1, padding=(0, 0, 0, 0), gain=1.0):
    """Direct numpy re-statement of _upfirdn2d_ref (upfirdn2d.py:166-210)."""
    x = np.asarray(x_nhwc, np.float64)
    f = np.asarray(f, np.float64)
    if f.ndim == 1:
        f = np.outer(f, f)
    f = f * (gain ** (2 / 2))
    B, H, W, C = x.shape
    px0, px1, py0, py1 = padding
    # zero-stuff (trailing zeros included)
    up_x = np.zeros((B, H * up, W * up, C))
    up_x[:, ::up, ::up, :] = x
    # pad or crop (negative pad = crop, ref :189-190)
    up_x = np.pad(up_x, ((0, 0), (max(py0, 0), max(py1, 0)),
                         (max(px0, 0), max(px1, 0)), (0, 0)))
    up_x = up_x[:, max(-py0, 0): up_x.shape[1] - max(-py1, 0),
                max(-px0, 0): up_x.shape[2] - max(-px1, 0), :]
    # convolve (true convolution: flip the filter)
    fh, fw = f.shape
    Ho = up_x.shape[1] - fh + 1
    Wo = up_x.shape[2] - fw + 1
    out = np.zeros((B, Ho, Wo, C))
    ff = f[::-1, ::-1]
    for i in range(fh):
        for j in range(fw):
            out += ff[i, j] * up_x[:, i : i + Ho, j : j + Wo, :]
    return out[:, ::down, ::down, :]


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (1, 1, 1, 1)), (2, 1, (2, 1, 2, 1)), (1, 2, (1, 1, 1, 1)),
    (2, 2, (2, 2, 2, 2)),
    # negative padding = crop before the filter (ref _upfirdn2d_ref :189-190)
    (1, 1, (-1, 2, 2, -1)), (2, 1, (-1, -1, 2, 2)), (2, 2, (-1, 2, -1, 2)),
    (1, 2, (0, -1, -1, 0)),
])
def test_upfirdn2d_matches_oracle(rng, up, down, pad):
    x = jax.random.normal(rng, (2, 6, 5, 3))
    f = jnp.asarray([1.0, 3.0, 3.0, 1.0])
    f2 = jnp.outer(f, f) / 16.0
    y = ops.upfirdn2d(x, f2, up=up, down=down, padding=pad)
    expected = upfirdn2d_oracle(x, np.asarray(f2), up=up, down=down, padding=pad)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=1e-5)


def test_upfirdn2d_separable_matches_2d(rng):
    x = jax.random.normal(rng, (1, 8, 8, 2))
    f1 = jnp.asarray([1.0, 2.0, 1.0]) / 4.0
    f2 = jnp.outer(f1, f1)
    y1 = ops.upfirdn2d(x, f1, up=2, padding=(1, 1, 1, 1))
    y2 = ops.upfirdn2d(x, f2, up=2, padding=(1, 1, 1, 1))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-5)


def test_upsample2d_shape_and_dc_gain(rng):
    x = jnp.ones((1, 4, 4, 1))
    f = ops.setup_filter([1, 3, 3, 1])
    y = ops.upsample2d(x, f, up=2)
    assert y.shape == (1, 8, 8, 1)
    # constant input should stay ~1 in the interior (filter is normalized;
    # upsample gain compensates the zero-stuffing)
    np.testing.assert_allclose(np.asarray(y)[0, 3:5, 3:5, 0], 1.0, rtol=1e-4)


def test_downsample2d_shape(rng):
    x = jax.random.normal(rng, (2, 8, 8, 3))
    f = ops.setup_filter([1, 3, 3, 1])
    y = ops.downsample2d(x, f, down=2)
    assert y.shape == (2, 4, 4, 3)


def test_filter2d_preserves_shape(rng):
    x = jax.random.normal(rng, (2, 7, 9, 3))
    f = ops.setup_filter([1, 2, 1])
    y = ops.filter2d(x, f)
    assert y.shape == x.shape


def test_setup_filter_normalizes():
    f = ops.setup_filter([1, 3, 3, 1])
    np.testing.assert_allclose(float(jnp.sum(f)), 1.0, rtol=1e-6)


# ---------------------------------------------------------------------------
# filtered_lrelu / conv2d_resample / fma
# ---------------------------------------------------------------------------


def test_filtered_lrelu_identity_filters(rng):
    x = jax.random.normal(rng, (1, 6, 6, 4))
    b = jnp.zeros((4,))
    y = ops.filtered_lrelu(x, None, None, b, up=1, down=1, gain=1.0, slope=0.2)
    expected = np.where(np.asarray(x) >= 0, np.asarray(x), 0.2 * np.asarray(x))
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5, atol=1e-6)


def test_filtered_lrelu_up2_shape(rng):
    x = jax.random.normal(rng, (1, 4, 4, 2))
    f = ops.setup_filter([1, 3, 3, 1])
    y = ops.filtered_lrelu(x, f, f, None, up=2, down=1)
    assert y.shape == (1, 8, 8, 2)


def test_conv2d_resample_plain_matches_lax(rng):
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (2, 8, 8, 3))
    w = jax.random.normal(k2, (3, 3, 3, 5))
    y = ops.conv2d_resample(x, w, padding=1)
    assert y.shape == (2, 8, 8, 5)
    y2 = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-5, atol=1e-5)


def test_conv2d_resample_up2(rng):
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (1, 4, 4, 3))
    w = jax.random.normal(k2, (1, 1, 3, 4))
    f = ops.setup_filter([1, 3, 3, 1])
    y = ops.conv2d_resample(x, w, f=f, up=2)
    assert y.shape == (1, 8, 8, 4)


def test_fma():
    a, b, c = jnp.ones((3,)) * 2, jnp.ones((3,)) * 3, jnp.ones((3,))
    np.testing.assert_allclose(np.asarray(ops.fma(a, b, c)), 7.0)


# ---------------------------------------------------------------------------
# knn
# ---------------------------------------------------------------------------


def test_knn_points_matches_bruteforce(rng):
    k1, k2 = jax.random.split(rng)
    pts = jax.random.normal(k1, (2, 100, 3))
    verts = jax.random.normal(k2, (2, 50, 3))
    dists, idx = ops.knn_points(pts, verts, k=1, chunk=32)
    p, v = np.asarray(pts), np.asarray(verts)
    d_full = ((p[:, :, None, :] - v[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx)[..., 0], d_full.argmin(-1))
    np.testing.assert_allclose(np.asarray(dists)[..., 0], d_full.min(-1), rtol=1e-4, atol=1e-5)


def test_knn_points_k3(rng):
    k1, k2 = jax.random.split(rng)
    pts = jax.random.normal(k1, (1, 40, 3))
    verts = jax.random.normal(k2, (1, 30, 3))
    dists, idx = ops.knn_points(pts, verts, k=3, chunk=16)
    assert dists.shape == (1, 40, 3) and idx.shape == (1, 40, 3)
    d = np.asarray(dists)
    assert (np.diff(d, axis=-1) >= -1e-6).all()  # sorted ascending


def test_knn_gather(rng):
    x = jnp.arange(24.0).reshape(1, 6, 4)
    idx = jnp.asarray([[[0, 5], [2, 2]]])
    out = ops.knn_gather(x, idx)
    assert out.shape == (1, 2, 2, 4)
    np.testing.assert_array_equal(np.asarray(out[0, 0, 1]), np.arange(20.0, 24.0))


def test_nn_pallas_matches_bruteforce(rng):
    from threedhumangan_tpu.ops.knn import nn_points_pallas

    k1, k2 = jax.random.split(rng)
    pts = jax.random.normal(k1, (2, 100, 3))
    verts = jax.random.normal(k2, (2, 50, 3))
    dists, idx = nn_points_pallas(pts, verts, tile_p=32, v_chunk=16, interpret=True)
    p, v = np.asarray(pts), np.asarray(verts)
    d_full = ((p[:, :, None, :] - v[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx)[..., 0], d_full.argmin(-1))
    np.testing.assert_allclose(np.asarray(dists)[..., 0], d_full.min(-1), rtol=1e-4, atol=1e-5)
