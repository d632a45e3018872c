"""Pad → upsample → FIR filter → downsample, in one XLA convolution.

Public-surface parity with the reference's ``upfirdn2d`` plugin
(lib/components/ops/upfirdn2d.py; the pure reference path `_upfirdn2d_ref`
at :166-210 is the behavioural spec).  TPU-native design:

  * images are NHWC (not NCHW);
  * the whole up/pad/filter/down chain is ONE ``lax.conv_general_dilated``
    call — zero-insertion upsampling becomes ``lhs_dilation``, downsampling
    becomes ``window_strides``, so XLA lowers the entire op onto the MXU
    without materializing the upsampled intermediate (the reference's CUDA
    kernel exists to avoid exactly that materialization);
  * gradients of any order come from JAX autodiff — no transpose-call
    recursion (reference upfirdn2d.py:249-268) is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


def setup_filter(
    f,
    normalize: bool = True,
    flip_filter: bool = False,
    gain: float = 1.0,
    separable: Optional[bool] = None,
) -> jax.Array:
    """Prepare a FIR filter for upfirdn2d (reference upfirdn2d.py:69-113)."""
    if f is None:
        f = 1.0
    f = jnp.asarray(f, jnp.float32)
    assert f.ndim in (0, 1, 2)
    if f.ndim == 0:
        f = f[None]
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = jnp.outer(f, f)
    if normalize:
        f = f / jnp.sum(f)
    if flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return f


def _parse_scaling(scaling) -> tuple:
    if isinstance(scaling, int):
        return scaling, scaling
    sx, sy = scaling
    return int(sx), int(sy)


def _parse_padding(padding) -> tuple:
    if isinstance(padding, int):
        return padding, padding, padding, padding
    padding = list(padding)
    if len(padding) == 2:
        px, py = padding
        return px, px, py, py
    px0, px1, py0, py1 = padding
    return px0, px1, py0, py1


def upfirdn2d(
    x: jax.Array,
    f: Optional[jax.Array],
    up: Union[int, Sequence[int]] = 1,
    down: Union[int, Sequence[int]] = 1,
    padding: Union[int, Sequence[int]] = 0,
    flip_filter: bool = False,
    gain: float = 1.0,
) -> jax.Array:
    """Apply upsample/FIR/downsample to an NHWC batch.

    Matches `_upfirdn2d_ref` semantics (upfirdn2d.py:166-210) with NHWC
    layout: zero-stuff by ``up`` (trailing zeros included), pad
    (negative = crop), convolve with ``f`` (flipped unless ``flip_filter``),
    then keep every ``down``-th sample.
    """
    assert x.ndim == 4, "expected NHWC"
    B, H, W, C = x.shape
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)

    if f is None:
        f = jnp.ones((1, 1), jnp.float32)
    f = jnp.asarray(f, jnp.float32)
    assert f.ndim in (1, 2)
    f = f * (gain ** (f.ndim / 2))
    if f.ndim == 1:
        # separable path: run two rank-1 convs (cheaper for long filters)
        fy = f.reshape(-1, 1)
        fx = f.reshape(1, -1)
        x = _upfirdn2d_conv(x, fy, (1, upy), (1, downy), (0, 0, pady0, pady1), flip_filter)
        x = _upfirdn2d_conv(x, fx, (upx, 1), (downx, 1), (padx0, padx1, 0, 0), flip_filter)
        return x
    return _upfirdn2d_conv(
        x, f, (upx, upy), (downx, downy), (padx0, padx1, pady0, pady1), flip_filter
    )


def _upfirdn2d_conv(x, f, up, down, padding, flip_filter):
    B, H, W, C = x.shape
    upx, upy = up
    downx, downy = down
    padx0, padx1, pady0, pady1 = padding

    if min(padx0, padx1, pady0, pady1) < 0:
        # Negative padding = crop applied BEFORE the filter (reference
        # `_upfirdn2d_ref` order, upfirdn2d.py:188-193).  Crop interacts
        # with both the zero-stuffing and the downsample stride, so this
        # path materializes the reference's upsampled intermediate
        # explicitly.  Nothing on the live model path uses negative pads
        # (only AugmentPipe's geometric branch can); correctness over speed.
        return _upfirdn2d_explicit(x, f, up, down, padding, flip_filter)

    if not flip_filter:
        f = jnp.flip(f, axis=(0, 1))
    fh, fw = f.shape

    # Trailing zeros of the reference's zero-stuffing: lhs_dilation only
    # inserts zeros *between* samples, so fold the missing (up-1) trailing
    # zeros into the trailing pad.
    pady1 = pady1 + upy - 1
    padx1 = padx1 + upx - 1

    kernel = jnp.tile(f.astype(x.dtype)[:, :, None, None], (1, 1, 1, C))
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(downy, downx),
        padding=((pady0, pady1), (padx0, padx1)),
        lhs_dilation=(upy, upx),
        feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # FIR taps are tiny; full precision costs nothing and keeps the op
        # bit-faithful to the reference spec even on backends whose DEFAULT
        # conv precision is bf16.
        precision=jax.lax.Precision.HIGHEST,
    )
    return y


def _upfirdn2d_explicit(x, f, up, down, padding, flip_filter):
    """Reference-order upfirdn2d with materialized zero-stuffing: upsample
    (trailing zeros included) -> pad/crop -> filter -> stride-downsample
    (`_upfirdn2d_ref`, reference upfirdn2d.py:166-210)."""
    B, H, W, C = x.shape
    upx, upy = up
    downx, downy = down
    padx0, padx1, pady0, pady1 = padding

    fh, fw = f.shape
    upW = W * upx + padx0 + padx1
    upH = H * upy + pady0 + pady1
    assert upW >= fw and upH >= fh, "upsampled buffer smaller than the filter"

    # zero-stuff, trailing zeros included (ref :183-186)
    y = jnp.zeros((B, H, upy, W, upx, C), x.dtype)
    y = y.at[:, :, 0, :, 0, :].set(x)
    y = y.reshape(B, H * upy, W * upx, C)

    # pad then crop (ref :189-190)
    y = jnp.pad(y, ((0, 0),
                    (max(pady0, 0), max(pady1, 0)),
                    (max(padx0, 0), max(padx1, 0)),
                    (0, 0)))
    y = y[:, max(-pady0, 0): y.shape[1] - max(-pady1, 0),
          max(-padx0, 0): y.shape[2] - max(-padx1, 0), :]

    if not flip_filter:
        f = jnp.flip(f, axis=(0, 1))
    kernel = jnp.tile(f.astype(x.dtype)[:, :, None, None], (1, 1, 1, C))
    # VALID conv with stride == full conv then slice [::down] (ref :205-209)
    y = jax.lax.conv_general_dilated(
        y, kernel,
        window_strides=(downy, downx),
        padding="VALID",
        feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y


def filter2d(x, f, padding=0, flip_filter=False, gain=1.0):
    """Same-size FIR filtering (reference upfirdn2d.py:276-310)."""
    fh, fw = _filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)
    px0 += fw // 2
    px1 += (fw - 1) // 2
    py0 += fh // 2
    py1 += (fh - 1) // 2
    return upfirdn2d(x, f, padding=(px0, px1, py0, py1), flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1.0):
    """FIR upsampling (reference upfirdn2d.py:313-350)."""
    upx, upy = _parse_scaling(up)
    fh, fw = _filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)
    px0 += (fw + upx - 1) // 2
    px1 += (fw - upx) // 2
    py0 += (fh + upy - 1) // 2
    py1 += (fh - upy) // 2
    return upfirdn2d(
        x, f, up=up, padding=(px0, px1, py0, py1), flip_filter=flip_filter,
        gain=gain * upx * upy,
    )


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1.0):
    """FIR downsampling (reference upfirdn2d.py:353-388)."""
    downx, downy = _parse_scaling(down)
    fh, fw = _filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)
    px0 += (fw - downx + 1) // 2
    px1 += (fw - downx) // 2
    py0 += (fh - downy + 1) // 2
    py1 += (fh - downy) // 2
    return upfirdn2d(x, f, down=down, padding=(px0, px1, py0, py1), flip_filter=flip_filter, gain=gain)


def _filter_size(f):
    if f is None:
        return 1, 1
    f = np.asarray(f)
    if f.ndim == 1:
        return int(f.shape[0]), int(f.shape[0])
    return int(f.shape[0]), int(f.shape[1])
