"""2D convolution with fused FIR up/down-sampling.

Public-surface parity with reference lib/components/ops/conv2d_resample.py
(:46-143).  NHWC layout; weights are HWIO.  XLA's convolution already fuses
dilation/striding, so this is mostly a thin orchestration layer; the
reference's gradfix machinery (conv2d_gradfix.py) is unnecessary — JAX
differentiates convolutions to arbitrary order natively.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from threedhumangan_tpu.ops.upfirdn2d import (
    _filter_size,
    _parse_padding,
    downsample2d,
    upfirdn2d,
    upsample2d,
)


def conv2d(x: jax.Array, w: jax.Array, stride: int = 1, padding=0, groups: int = 1):
    """Plain NHWC/HWIO convolution (correlation, torch semantics)."""
    px0, px1, py0, py1 = _parse_padding(padding)
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((py0, py1), (px0, px1)),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv2d_resample(
    x: jax.Array,
    w: jax.Array,
    f: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    groups: int = 1,
    flip_weight: bool = True,
    flip_filter: bool = False,
) -> jax.Array:
    """conv2d with optional FIR-filtered up/downsampling.

    ``flip_weight=True`` means correlation (torch conv2d); False means true
    convolution (weight spatially flipped), matching the reference's
    flip_weight semantics (conv2d_resample.py:36-44).
    """
    assert x.ndim == 4 and w.ndim == 4
    kh, kw = w.shape[0], w.shape[1]
    if not flip_weight:
        w = jnp.flip(w, axis=(0, 1))
    px0, px1, py0, py1 = _parse_padding(padding)

    if up > 1:
        fw, fh = _filter_size(f)
        x = upsample2d(
            x, f, up=up,
            padding=(px0 + (kw - 1) // 2, px1 + kw // 2, py0 + (kh - 1) // 2, py1 + kh // 2),
            flip_filter=flip_filter,
        )
        x = conv2d(x, w, groups=groups)
        if down > 1:
            x = downsample2d(x, f, down=down, flip_filter=flip_filter)
        return x

    if down > 1:
        x = upfirdn2d(
            x, f,
            padding=(px0 + (kw - 1) // 2, px1 + kw // 2, py0 + (kh - 1) // 2, py1 + kh // 2),
            flip_filter=flip_filter,
        )
        x = conv2d(x, w, stride=down, groups=groups)
        return x

    return conv2d(x, w, padding=(px0, px1, py0, py1), groups=groups)


def fma(a: jax.Array, b: jax.Array, c: jax.Array) -> jax.Array:
    """a * b + c (reference lib/components/ops/fma.py:15-58; XLA fuses this
    into a single op, and JAX grads are native)."""
    return a * b + c
