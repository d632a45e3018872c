"""Adaptive discriminator augmentation (ADA) pipeline.

Functional parity with reference ``lib/data/augment.py`` (AugmentPipe,
StyleGAN2-ADA): probability-gated pixel blits (xflip, rotate90, integer
translation), general geometric transforms (isotropic/anisotropic scale,
arbitrary rotation, fractional translation) applied as ONE composed affine
warp, and color transforms (brightness, contrast, saturation) applied as ONE
composed color matrix.

Reference caveats this implementation fixes (SURVEY.md §5 'ADA caveat'):
  * the reference never actually applies AugmentPipe to any image batch and
    its geometric path would NameError (augment.py:63 uses an undefined
    ``misc``); here ``augment_pipe`` is a working pure function the trainer
    can apply to both real and fake D inputs;
  * parity default is preserved: configs ship ``ada_interval: 0`` so p
    stays 0 and the pipe is a no-op unless enabled.

TPU-first: per-image transform parameters are sampled with explicit RNG;
the geometric path is a single bilinear ``grid sample`` (gather + lerp,
fully vectorized); no upfirdn wavelet path is needed because XLA fuses the
warp with the surrounding elementwise chain.  Images NHWC in [-1, 1].
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def _affine2d(theta=0.0, sx=1.0, sy=1.0, tx=0.0, ty=0.0):
    """Compose scale -> rotate -> translate as 3x3 row matrices (batched)."""
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    zeros = jnp.zeros_like(cos)
    ones = jnp.ones_like(cos)
    m = jnp.stack(
        [
            cos * sx, -sin * sy, tx,
            sin * sx, cos * sy, ty,
            zeros, zeros, ones,
        ],
        axis=-1,
    ).reshape(*jnp.shape(cos), 3, 3)
    return m


def grid_sample_bilinear(img: jax.Array, grid: jax.Array) -> jax.Array:
    """Bilinear sampling; img NHWC, grid (B, H, W, 2) in [-1, 1] (x, y).
    Zero padding outside.  Differentiable (replaces grid_sample_gradfix —
    JAX grids are natively double-differentiable)."""
    B, H, W, C = img.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(yy, xx):
        inb = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
        xc = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        vals = jax.vmap(lambda im, yi, xi: im[yi, xi])(img, yc, xc)
        return vals * inb[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


class AugmentPipe:
    """Probability-gated augmentation (ref augment.py:131-453).

    ``p`` is host-side mutable state driven by the ADA controller
    (base_trainer.py:133-145 semantics, see trainers.base_trainer)."""

    def __init__(self, xflip=0, rotate90=0, xint=0, xint_max=0.125,
                 scale=0, rotate=0, aniso=0, xfrac=0,
                 scale_std=0.2, rotate_max=1.0, aniso_std=0.2, xfrac_std=0.125,
                 brightness=0, contrast=0, saturation=0,
                 brightness_std=0.2, contrast_std=0.5, saturation_std=1.0,
                 **_unused):
        self.cfg = dict(
            xflip=xflip, rotate90=rotate90, xint=xint, xint_max=xint_max,
            scale=scale, rotate=rotate, aniso=aniso, xfrac=xfrac,
            scale_std=scale_std, rotate_max=rotate_max, aniso_std=aniso_std,
            xfrac_std=xfrac_std, brightness=brightness, contrast=contrast,
            saturation=saturation, brightness_std=brightness_std,
            contrast_std=contrast_std, saturation_std=saturation_std)
        self.p = 0.0

    def __call__(self, images: jax.Array, rng: jax.Array, p: Optional[float] = None):
        return augment_pipe(images, rng, self.cfg, self.p if p is None else p)


def augment_pipe(images: jax.Array, rng: jax.Array, cfg: Dict, p) -> jax.Array:
    """Apply the pipeline at probability ``p`` (traced scalar ok)."""
    B, H, W, C = images.shape
    keys = jax.random.split(rng, 20)
    k = iter(keys)

    def gate(key, strength):
        """per-image bernoulli(p * strength)"""
        return jax.random.uniform(key, (B,)) < p * strength

    # ---- pixel blits ----
    if cfg.get("xflip", 0):
        do = gate(next(k), cfg["xflip"])
        images = jnp.where(do[:, None, None, None], images[:, :, ::-1, :], images)
    if cfg.get("rotate90", 0):
        do = gate(next(k), cfg["rotate90"])
        n = jax.random.randint(next(k), (B,), 0, 4)
        r1 = jnp.rot90(images, 1, axes=(1, 2)) if H == W else images
        r2 = jnp.rot90(images, 2, axes=(1, 2))
        if H == W:
            r3 = jnp.rot90(images, 3, axes=(1, 2))
            rot = jnp.stack([images, r1, r2, r3], axis=1)
            sel = jnp.take_along_axis(rot, n[:, None, None, None, None], axis=1)[:, 0]
        else:
            sel = jnp.where((n[:, None, None, None] % 2) == 0, images, r2)
        images = jnp.where(do[:, None, None, None], sel, images)

    # ---- geometric warp (one composed affine) ----
    theta = jnp.zeros((B,))
    sx = jnp.ones((B,))
    sy = jnp.ones((B,))
    tx = jnp.zeros((B,))
    ty = jnp.zeros((B,))

    if cfg.get("xint", 0):
        do = gate(next(k), cfg["xint"])
        t = jax.random.uniform(next(k), (B, 2), minval=-1, maxval=1) * cfg["xint_max"]
        tx = tx + jnp.where(do, jnp.round(t[:, 0] * W) / max(W - 1, 1) * 2, 0.0)
        ty = ty + jnp.where(do, jnp.round(t[:, 1] * H) / max(H - 1, 1) * 2, 0.0)
    if cfg.get("scale", 0):
        do = gate(next(k), cfg["scale"])
        s = jnp.exp2(jax.random.normal(next(k), (B,)) * cfg["scale_std"])
        s = jnp.where(do, s, 1.0)
        sx, sy = sx * s, sy * s
    if cfg.get("rotate", 0):
        do = gate(next(k), cfg["rotate"])
        r = jax.random.uniform(next(k), (B,), minval=-1, maxval=1) * (
            math.pi * cfg["rotate_max"])
        theta = theta + jnp.where(do, r, 0.0)
    if cfg.get("aniso", 0):
        do = gate(next(k), cfg["aniso"])
        a = jnp.exp2(jax.random.normal(next(k), (B,)) * cfg["aniso_std"])
        a = jnp.where(do, a, 1.0)
        sx, sy = sx * a, sy / a
    if cfg.get("xfrac", 0):
        do = gate(next(k), cfg["xfrac"])
        t = jax.random.normal(next(k), (B, 2)) * cfg["xfrac_std"]
        tx = tx + jnp.where(do, t[:, 0] * 2, 0.0)
        ty = ty + jnp.where(do, t[:, 1] * 2, 0.0)

    needs_warp = any(cfg.get(kk, 0) for kk in ("xint", "scale", "rotate", "aniso", "xfrac"))
    if needs_warp:
        # inverse warp: sample source coords for each output pixel
        inv = jnp.linalg.inv(_affine2d(theta, sx, sy, tx, ty))
        ys = jnp.linspace(-1.0, 1.0, H)
        xs = jnp.linspace(-1.0, 1.0, W)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        ones = jnp.ones_like(gx)
        pix = jnp.stack([gx, gy, ones], axis=-1).reshape(1, H * W, 3)
        src = jnp.einsum("bij,bnj->bni", inv, jnp.broadcast_to(pix, (B, H * W, 3)))
        grid = src[..., :2].reshape(B, H, W, 2)
        images = grid_sample_bilinear(images, grid)

    # ---- color transforms (one composed per-channel affine) ----
    gain = jnp.ones((B, 1, 1, 1))
    bias = jnp.zeros((B, 1, 1, 1))
    if cfg.get("brightness", 0):
        do = gate(next(k), cfg["brightness"])
        b = jax.random.normal(next(k), (B,)) * cfg["brightness_std"]
        bias = bias + jnp.where(do, b, 0.0)[:, None, None, None]
    if cfg.get("contrast", 0):
        do = gate(next(k), cfg["contrast"])
        c = jnp.exp2(jax.random.normal(next(k), (B,)) * cfg["contrast_std"])
        gain = gain * jnp.where(do, c, 1.0)[:, None, None, None]
    images = images * gain + bias

    if cfg.get("saturation", 0) and C == 3:
        do = gate(next(k), cfg["saturation"])
        s = jnp.exp2(jax.random.normal(next(k), (B,)) * cfg["saturation_std"])
        s = jnp.where(do, s, 1.0)[:, None, None, None]
        mean = jnp.mean(images, axis=-1, keepdims=True)
        images = mean + (images - mean) * s

    return images
