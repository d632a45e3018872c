"""Training losses.

Behavioural parity with reference ``lib/trainers/phase_trainer.py``:
  segmentation_loss   (ref _calculate_segmentation_loss :203-256) — balanced
      per-pixel cross-entropy with class-0 (fake) excluded from weights,
      reciprocal-frequency class balancing, inf-guard, prior weights.
  r1_regularization   (ref _calculate_r1_regularization :259-294) — R1 on
      sum(softmax(segments)) [or sum(prediction) when gan_lambda>0] w.r.t.
      the discriminator input.  JAX's native higher-order AD replaces the
      GradScaler scale/unscale dance; the NaN guard (ref :291-292) is kept.
  softplus GAN loss   (ref :404-407, :491-494)
  latent smooth-L1    (ref :424-439, :496-513)

All images NHWC; segments logits (B, H, W, L); gt labels (B, H, W) int.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def smooth_l1(x: jax.Array, y: jax.Array, beta: float = 0.1) -> jax.Array:
    """torch F.smooth_l1_loss(beta=beta), mean reduction."""
    d = jnp.abs(x - y)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def _resize_labels(gt: jax.Array, h: int, w: int) -> jax.Array:
    """Nearest-neighbour label resize (ref :216-220)."""
    if gt.shape[1] == h and gt.shape[2] == w:
        return gt
    return jax.image.resize(gt, (gt.shape[0], h, w), method="nearest")


def _cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-pixel CE, no reduction; logits (B,H,W,L), labels (B,H,W)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def segmentation_loss(
    segments: jax.Array,
    gt_segments: jax.Array,
    label_dim: int,
    mode: str = "cross_entropy_balanced",
    prior_weights: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (loss, accuracy, real_prob) (ref :203-256)."""
    B, H, W, L = segments.shape
    gt = _resize_labels(gt_segments, H, W).astype(jnp.int32)

    if prior_weights is None:
        prior = jnp.ones((label_dim,), segments.dtype)
    else:
        prior = jnp.asarray(prior_weights, segments.dtype)
    prior = prior / jnp.mean(prior)

    if mode == "cross_entropy":
        loss = jnp.mean(_cross_entropy(segments, gt))
    elif mode == "cross_entropy_multiclass":
        one_hot = jax.nn.one_hot(gt, label_dim, dtype=segments.dtype)
        one_hot = one_hot.at[..., 1].set(jnp.where(gt > 0, 1.0, one_hot[..., 1]))
        loss = jnp.mean(
            jnp.maximum(segments, 0) - segments * one_hot + jnp.log1p(jnp.exp(-jnp.abs(segments))))
    elif mode == "cross_entropy_balanced":
        one_hot = jax.nn.one_hot(gt, label_dim, dtype=segments.dtype)
        class_occurrence = jnp.sum(one_hot, axis=(0, 1, 2))
        class_occurrence = class_occurrence.at[0].set(0.0)
        num_classes_occur = jnp.sum(class_occurrence > 0)
        total = jnp.asarray(one_hot.size, segments.dtype)
        coeff = jnp.where(
            class_occurrence > 0,
            total / (jnp.maximum(class_occurrence, 1e-12) * jnp.maximum(num_classes_occur, 1) * L),
            0.0,
        )
        coeff = coeff.at[0].set(0.0) * prior
        weight_map = coeff[gt]
        ce = _cross_entropy(segments, gt)
        balanced = jnp.mean(ce * weight_map)
        plain = jnp.mean(ce)
        # ref :229-242: fall back to plain CE when no foreground exists
        loss = jnp.where(jnp.any(gt > 0), balanced, plain)
    elif mode == "softplus":
        one_hot = jax.nn.one_hot(gt, label_dim, dtype=segments.dtype)
        one_hot = one_hot.at[..., 1].set(jnp.where(gt > 0, 1.0, one_hot[..., 1]))
        signed = jnp.where(one_hot > 0, -segments, segments)
        loss = (
            jnp.mean(jax.nn.softplus(signed[..., 0]))
            + jnp.mean(jax.nn.softplus(signed[..., 1]))
            + jnp.mean(jax.nn.softplus(signed[..., 2:]))
        ) / 3.0
    else:
        raise ValueError(f"unknown segmentation loss mode {mode}")

    probs = jax.nn.softmax(segments, axis=-1)
    real_prob = jnp.mean(1.0 - probs[..., 0])
    pred_labels = jnp.argmax(segments[..., 1:], axis=-1) + 1
    accuracy = jnp.mean((pred_labels == gt).astype(jnp.float32))
    return loss, accuracy, real_prob


def r1_regularization(
    disc_forward: Callable[[jax.Array], Dict],
    disc_input_real: jax.Array,
    r1_lambda: float,
    gan_lambda: float = 0.0,
    segmentation_lambda: float = 1.0,
) -> jax.Array:
    """R1 gradient penalty w.r.t. the real input (ref :259-294).

    ``disc_forward`` maps images -> discriminator output dict (params
    closed over).  When gan_lambda > 0 the penalty targets the real/fake
    logit; otherwise the softmax of the segmentation head.
    """
    if gan_lambda > 0:
        scalar = lambda img: jnp.sum(disc_forward(img)["prediction"])
    elif segmentation_lambda > 0:
        scalar = lambda img: jnp.sum(jax.nn.softmax(disc_forward(img)["segments"], axis=-1))
    else:
        raise ValueError("R1 needs gan_lambda>0 or segmentation_lambda>0")

    grad_real = jax.grad(scalar)(disc_input_real)
    B = grad_real.shape[0]
    penalty = jnp.sum(jnp.square(grad_real).reshape(B, -1), axis=1)
    penalty = 0.5 * r1_lambda * jnp.mean(penalty)
    # NaN guard (ref :291-292)
    return jnp.where(jnp.isnan(penalty), 0.0, penalty)


def gan_loss_d(pred_real: jax.Array, pred_gen: jax.Array) -> jax.Array:
    """Non-saturating softplus D loss (ref :404-405)."""
    return jnp.mean(jax.nn.softplus(pred_gen)) + jnp.mean(jax.nn.softplus(-pred_real))


def gan_loss_g(pred_gen: jax.Array) -> jax.Array:
    """(ref :491-492)"""
    return jnp.mean(jax.nn.softplus(-pred_gen))


def topk_fraction(step, meta: Dict):
    """Decayed keep-fraction max(0.99^(step/interval), topk_v) (ref :483-486).
    ``step`` may be traced; returns 1.0 statically when the knobs are unset."""
    if "topk_interval" in meta and "topk_v" in meta:
        return jnp.maximum(0.99 ** (step / meta["topk_interval"]), meta["topk_v"])
    return None


def gan_loss_g_topk(pred_gen: jax.Array, step, meta: Dict) -> jax.Array:
    """Non-saturating G loss over the top-k predictions (ref :482-494).

    The reference applies ``torch.topk(pred_gen, ceil(frac*B), dim=0)`` — a
    per-location top-k over the BATCH axis — then means softplus(-values).
    Implemented with a traced k (sort + rank mask) so the decaying fraction
    never retriggers compilation; softplus(-x) is monotone decreasing, so
    top-k by value == bottom-k by loss, matching the reference exactly.
    """
    frac = topk_fraction(step, meta)
    if frac is None:
        return gan_loss_g(pred_gen)
    B = pred_gen.shape[0]
    k = jnp.ceil(frac * B)  # torch topk_num = math.ceil(pct * B)
    sorted_desc = -jnp.sort(-pred_gen, axis=0)
    rank = jnp.arange(B).reshape((B,) + (1,) * (pred_gen.ndim - 1))
    mask = (rank < k).astype(pred_gen.dtype)
    denom = k * (pred_gen.size // B)
    return jnp.sum(jax.nn.softplus(-sorted_desc) * mask) / denom
