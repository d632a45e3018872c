"""Adaptive discriminator augmentation (ADA) pipeline.

Functional parity with reference ``lib/data/augment.py`` (AugmentPipe,
StyleGAN2-ADA): probability-gated pixel blits (xflip, rotate90, integer
translation), general geometric transforms (isotropic/anisotropic scale,
arbitrary rotation, fractional translation) applied as ONE composed affine
warp, color transforms (brightness, contrast, lumaflip, hue, saturation)
composed into ONE homogeneous 4x4 color matrix applied once (ref
:330-388), wavelet-band image-space filtering (``imgfilter``, ref
:394-428: per-band log-normal amplification of a sym2 filter bank applied
as a separable depthwise conv), additive RGB noise and cutout (ref
:434-453).

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

import functools
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# sym2 wavelet low-pass coefficients (ref augment.py wavelets['sym2'])
_SYM2 = [-0.12940952255092145, 0.22414386804185735,
         0.836516303737469, 0.48296291314469025]


@functools.lru_cache()
def _wavelet_fbank(num_bands: int = 4) -> np.ndarray:
    """4-band bandpass filter bank from the sym2 wavelet (ref :186-195)."""
    hz_lo = np.asarray(_SYM2)
    hz_hi = hz_lo * ((-1.0) ** np.arange(hz_lo.size))
    hz_lo2 = np.convolve(hz_lo, hz_lo[::-1]) / 2.0
    hz_hi2 = np.convolve(hz_hi, hz_hi[::-1]) / 2.0
    fbank = np.eye(num_bands, 1)
    for i in range(1, num_bands):
        # upsample rows by 2 (zero-interleave), refine with the lowpass,
        # then add the highpass band on row i
        fbank = np.dstack([fbank, np.zeros_like(fbank)]).reshape(
            fbank.shape[0], -1)[:, :-1]
        fbank = np.stack([np.convolve(row, hz_lo2) for row in fbank])
        lo = (fbank.shape[1] - hz_hi2.size) // 2
        fbank[i, lo:lo + hz_hi2.size] += hz_hi2
    return fbank.astype(np.float32)


# homogeneous 4x4 color-space transform helpers (ref :56-80 matrix utils)
_LUMA = np.asarray([1.0, 1.0, 1.0, 0.0]) / np.sqrt(3.0)


def _translate3d(b):
    """(B,) -> (B, 4, 4) translation by (b, b, b)."""
    B = b.shape[0]
    m = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    return m.at[:, :3, 3].set(b[:, None])


def _scale3d(c):
    """(B,) -> (B, 4, 4) scale by (c, c, c)."""
    d = jnp.stack([c, c, c, jnp.ones_like(c)], axis=-1)
    return jax.vmap(jnp.diag)(d)


def _rotate3d_luma(theta):
    """(B,) -> (B, 4, 4) rotation about the luma axis (Rodrigues)."""
    v = _LUMA[:3] / np.linalg.norm(_LUMA[:3])
    K = np.asarray([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    vvt = np.outer(v, v)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    R3 = (cos[:, None, None] * np.eye(3) + sin[:, None, None] * K
          + (1 - cos)[:, None, None] * vvt)
    m = jnp.broadcast_to(jnp.eye(4), (theta.shape[0], 4, 4))
    return m.at[:, :3, :3].set(R3)


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
                 brightness=0, contrast=0, lumaflip=0, hue=0, saturation=0,
                 brightness_std=0.2, contrast_std=0.5, hue_max=1.0,
                 saturation_std=1.0,
                 imgfilter=0, imgfilter_bands=(1, 1, 1, 1), imgfilter_std=1.0,
                 noise=0, cutout=0, noise_std=0.1, cutout_size=0.5,
                 **_unused):
        self.cfg = dict(
            xflip=xflip, rotate90=rotate90, xint=xint, xint_max=xint_max,
            scale=scale, rotate=rotate, aniso=aniso, xfrac=xfrac,
            scale_std=scale_std, rotate_max=rotate_max, aniso_std=aniso_std,
            xfrac_std=xfrac_std, brightness=brightness, contrast=contrast,
            lumaflip=lumaflip, hue=hue, saturation=saturation,
            brightness_std=brightness_std, contrast_std=contrast_std,
            hue_max=hue_max, saturation_std=saturation_std,
            imgfilter=imgfilter, imgfilter_bands=tuple(imgfilter_bands),
            imgfilter_std=imgfilter_std, noise=noise, cutout=cutout,
            noise_std=noise_std, cutout_size=cutout_size)
        self.p = 0.0

    def __call__(self, images: jax.Array, rng: jax.Array, p: Optional[float] = None):
        return augment_pipe(images, rng, self.cfg, self.p if p is None else p)


def augment_pipe(images: jax.Array, rng: jax.Array, cfg: Dict, p) -> jax.Array:
    """Apply the pipeline at probability ``p`` (traced scalar ok)."""
    B, H, W, C = images.shape
    keys = jax.random.split(rng, 40)
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
        if H == W:
            src = images
            py = px = 0
        else:
            # non-square inputs (SHHQ is 2:1): pad to square, rotate, crop
            # back — all four rotations stay admissible instead of silently
            # degrading to {0, 180} (the reference AugmentPipe assumes
            # square inputs).  90/270 crop rotated content at the long
            # edges; that is inherent to fixed-shape rotation.
            side = max(H, W)
            py, px = (side - H) // 2, (side - W) // 2
            src = jnp.pad(
                images, ((0, 0), (py, side - H - py), (px, side - W - px), (0, 0)))
        rot = jnp.stack([src] + [jnp.rot90(src, i, axes=(1, 2)) for i in (1, 2, 3)],
                        axis=1)
        sel = jnp.take_along_axis(rot, n[:, None, None, None, None], axis=1)[:, 0]
        if H != W:
            sel = sel[:, py:py + H, px:px + W, :]
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

    # ---- color transforms: ONE homogeneous 4x4 matrix, composed in the
    # reference's order brightness -> contrast -> lumaflip -> hue ->
    # saturation and applied once (ref :330-388) ----
    Cm = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    any_color = False
    if cfg.get("brightness", 0):
        do = gate(next(k), cfg["brightness"])
        b = jax.random.normal(next(k), (B,)) * cfg["brightness_std"]
        Cm = _translate3d(jnp.where(do, b, 0.0)) @ Cm
        any_color = True
    if cfg.get("contrast", 0):
        do = gate(next(k), cfg["contrast"])
        c = jnp.exp2(jax.random.normal(next(k), (B,)) * cfg["contrast_std"])
        Cm = _scale3d(jnp.where(do, c, 1.0)) @ Cm
        any_color = True
    vvt = np.outer(_LUMA, _LUMA)
    if cfg.get("lumaflip", 0):
        # Householder reflection about the luma axis (ref :350-357)
        do = gate(next(k), cfg["lumaflip"])
        i = jnp.floor(jax.random.uniform(next(k), (B,)) * 2)
        i = jnp.where(do, i, 0.0)
        Cm = (jnp.eye(4) - 2.0 * vvt * i[:, None, None]) @ Cm
        any_color = True
    if cfg.get("hue", 0) and C > 1:
        # rotation around the luma axis (ref :359-365)
        do = gate(next(k), cfg["hue"])
        theta = (jax.random.uniform(next(k), (B,)) * 2 - 1) * (
            math.pi * cfg.get("hue_max", 1.0))
        Cm = _rotate3d_luma(jnp.where(do, theta, 0.0)) @ Cm
        any_color = True
    if cfg.get("saturation", 0) and C > 1:
        # blend towards luma (ref :367-372)
        do = gate(next(k), cfg["saturation"])
        s = jnp.exp2(jax.random.normal(next(k), (B,)) * cfg["saturation_std"])
        s = jnp.where(do, s, 1.0)
        Cm = (vvt + (jnp.eye(4) - vvt) * s[:, None, None]) @ Cm
        any_color = True

    if any_color:
        px = images.reshape(B, H * W, C)
        if C == 3:
            px = jnp.einsum("bij,bnj->bni", Cm[:, :3, :3], px) + Cm[:, None, :3, 3]
        else:  # single channel: average the RGB rows (ref :384-386)
            Cme = jnp.mean(Cm[:, :3, :], axis=1)
            px = px * jnp.sum(Cme[:, None, :3], axis=-1, keepdims=True) \
                + Cme[:, None, 3:]
        images = px.reshape(B, H, W, C)

    # ---- image-space filtering: per-band wavelet amplification applied as
    # a separable depthwise conv with reflect padding (ref :394-428) ----
    if cfg.get("imgfilter", 0):
        bands = list(cfg.get("imgfilter_bands", (1, 1, 1, 1)))
        fbank = jnp.asarray(_wavelet_fbank(len(bands)))  # (bands, taps)
        expected_power = jnp.asarray(
            np.array([10.0, 1.0, 1.0, 1.0])[: len(bands)] / 13.0)
        g = jnp.ones((B, len(bands)))
        for i, band_strength in enumerate(bands):
            t_i = jnp.exp2(jax.random.normal(next(k), (B,)) * cfg.get("imgfilter_std", 1.0))
            t_i = jnp.where(gate(next(k), cfg["imgfilter"] * band_strength), t_i, 1.0)
            t = jnp.ones((B, len(bands))).at[:, i].set(t_i)
            t = t / jnp.sqrt(jnp.sum(expected_power * jnp.square(t), axis=-1,
                                     keepdims=True))
            g = g * t
        hz = g @ fbank                              # (B, taps)
        taps = hz.shape[-1]
        pad = taps // 2
        # depthwise separable conv in NHWC: channels become B*C groups
        x = images.transpose(1, 2, 0, 3).reshape(1, H, W, B * C)
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
        kern = jnp.repeat(hz[:, None, :], C, axis=1).reshape(B * C, taps)
        kx = kern.T[None, :, None, :]               # HWIO (1, taps, 1, B*C)
        x = jax.lax.conv_general_dilated(
            x, kx, (1, 1), "VALID", feature_group_count=B * C,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ky = kern.T[:, None, None, :]               # HWIO (taps, 1, 1, B*C)
        x = jax.lax.conv_general_dilated(
            x, ky, (1, 1), "VALID", feature_group_count=B * C,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        images = x.reshape(H, W, B, C).transpose(2, 0, 1, 3)

    # ---- image-space corruptions (ref :434-453) ----
    if cfg.get("noise", 0):
        sigma = jnp.abs(jax.random.normal(next(k), (B,))) * cfg.get("noise_std", 0.1)
        sigma = jnp.where(gate(next(k), cfg["noise"]), sigma, 0.0)
        images = images + jax.random.normal(next(k), images.shape) \
            * sigma[:, None, None, None]
    if cfg.get("cutout", 0):
        size = jnp.where(gate(next(k), cfg["cutout"]),
                         cfg.get("cutout_size", 0.5), 0.0)
        center = jax.random.uniform(next(k), (B, 2))
        cx = jnp.arange(W)[None, None, :]
        cy = jnp.arange(H)[None, :, None]
        mask_x = jnp.abs((cx + 0.5) / W - center[:, 0, None, None]) \
            >= size[:, None, None] / 2
        mask_y = jnp.abs((cy + 0.5) / H - center[:, 1, None, None]) \
            >= size[:, None, None] / 2
        images = images * (mask_x | mask_y)[..., None]

    return images
