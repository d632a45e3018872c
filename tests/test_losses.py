"""Loss-function oracles (reference phase_trainer.py:203-294 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threedhumangan_tpu.trainers import losses as L


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def balanced_ce_oracle(segments, gt, label_dim):
    """Direct numpy re-statement of ref :228-241."""
    B, H, W, Ld = segments.shape
    one_hot = np.eye(label_dim)[gt]  # (B,H,W,L)
    occ = one_hot.sum(axis=(0, 1, 2))
    occ[0] = 0
    n_occur = (occ > 0).sum()
    total = one_hot.size
    with np.errstate(divide="ignore"):
        coeff = np.where(occ > 0, total / (occ * n_occur * Ld), 0.0)
    coeff[0] = 0
    weight_map = coeff[gt]
    logp = np.log(_softmax(segments))
    ce = -np.take_along_axis(logp, gt[..., None], axis=-1)[..., 0]
    return (ce * weight_map).mean()


def test_balanced_ce_matches_oracle(rng):
    B, H, W, Ld = 2, 6, 5, 7
    k1, k2 = jax.random.split(rng)
    segments = jax.random.normal(k1, (B, H, W, Ld))
    gt = jax.random.randint(k2, (B, H, W), 1, Ld)
    loss, acc, prob = L.segmentation_loss(segments, gt, Ld)
    expected = balanced_ce_oracle(np.asarray(segments), np.asarray(gt), Ld)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-4)
    assert 0 <= float(acc) <= 1
    assert 0 <= float(prob) <= 1


def test_balanced_ce_all_background_falls_back_to_plain():
    # gt == 0 everywhere (all "fake") -> plain CE fallback (ref :241-242)
    segments = jnp.zeros((1, 4, 4, 5))
    gt = jnp.zeros((1, 4, 4), jnp.int32)
    loss, _, _ = L.segmentation_loss(segments, gt, 5)
    np.testing.assert_allclose(float(loss), np.log(5), rtol=1e-4)


def test_plain_and_softplus_modes(rng):
    B, H, W, Ld = 1, 4, 4, 6
    segments = jax.random.normal(rng, (B, H, W, Ld))
    gt = jax.random.randint(rng, (B, H, W), 0, Ld)
    for mode in ("cross_entropy", "cross_entropy_multiclass", "softplus"):
        loss, _, _ = L.segmentation_loss(segments, gt, Ld, mode=mode)
        assert np.isfinite(float(loss))


def test_smooth_l1_matches_torch_formula():
    x = jnp.asarray([0.0, 0.05, 0.2, -1.0])
    y = jnp.zeros(4)
    beta = 0.1
    d = np.abs(np.asarray(x))
    expected = np.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta).mean()
    np.testing.assert_allclose(float(L.smooth_l1(x, y, beta)), expected, rtol=1e-6)


def test_r1_on_quadratic_discriminator():
    """For D(img) with segments = img @ A (linear in input), softmax-sum R1
    has an analytically checkable gradient; verify against autodiff-free
    finite differences."""
    rng = jax.random.PRNGKey(0)
    A = jax.random.normal(rng, (3, 5)) * 0.3
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3))

    def fwd(im):
        return {"segments": jnp.einsum("bhwc,cl->bhwl", im, A),
                "prediction": jnp.sum(im, axis=-1, keepdims=True)}

    r1 = L.r1_regularization(fwd, img, r1_lambda=0.25, gan_lambda=0, segmentation_lambda=1)
    # numeric grad of sum(softmax) at img
    def scalar(im):
        return float(jnp.sum(jax.nn.softmax(fwd(im)["segments"], axis=-1)))
    eps = 1e-3
    g = np.zeros_like(np.asarray(img))
    it = np.nditer(np.asarray(img[0, 0, 0]))  # sample a few entries only
    for c in range(3):
        de = np.zeros_like(np.asarray(img))
        de[0, 0, 0, c] = eps
        g[0, 0, 0, c] = (scalar(jnp.asarray(np.asarray(img) + de))
                         - scalar(jnp.asarray(np.asarray(img) - de))) / (2 * eps)
    exact = jax.grad(lambda im: jnp.sum(jax.nn.softmax(fwd(im)["segments"], -1)))(img)
    np.testing.assert_allclose(np.asarray(exact)[0, 0, 0], g[0, 0, 0], atol=1e-3)
    assert float(r1) >= 0

    # gan-mode R1 targets the prediction head
    r1_gan = L.r1_regularization(fwd, img, r1_lambda=0.5, gan_lambda=1, segmentation_lambda=1)
    # d(prediction sum)/d(img) == 1 everywhere -> penalty = 0.5*0.5*mean(sum 1)
    expected = 0.5 * 0.5 * (4 * 4 * 3)
    np.testing.assert_allclose(float(r1_gan), expected, rtol=1e-5)


def test_gan_loss_g_topk_matches_torch_oracle():
    """torch.topk(pred, ceil(frac*B), dim=0) then softplus(-v).mean()
    (ref phase_trainer.py:482-494)."""
    import math

    import torch

    pred = np.random.RandomState(0).randn(8, 1, 4, 4).astype(np.float32)
    meta = {"topk_interval": 2000, "topk_v": 0.5}
    step = 100000
    pct = max(0.99 ** (step / meta["topk_interval"]), meta["topk_v"])
    topk_num = math.ceil(pct * pred.shape[0])
    assert topk_num == 5
    t = torch.topk(torch.from_numpy(pred), topk_num, dim=0).values
    expected = torch.nn.functional.softplus(-t).mean().item()
    got = L.gan_loss_g_topk(jnp.asarray(pred), step, meta)
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)

    # identity (plain mean) when the knobs are unset or fraction == 1
    got_id = L.gan_loss_g_topk(jnp.asarray(pred), 0, {})
    np.testing.assert_allclose(float(got_id), float(L.gan_loss_g(jnp.asarray(pred))), rtol=1e-6)
    got_full = L.gan_loss_g_topk(jnp.asarray(pred), 0, meta)
    np.testing.assert_allclose(float(got_full), float(L.gan_loss_g(jnp.asarray(pred))), rtol=1e-5)
