"""Fused upsample → bias → leaky-ReLU → clamp → downsample.

Public-surface parity with the reference's ``filtered_lrelu`` plugin
(lib/components/ops/filtered_lrelu.py:119+ reference path; StyleGAN3 CUDA
kernel at ops/filtered_lrelu.cu).  Composed from the TPU-native upfirdn2d
and bias_act ops; XLA fuses the elementwise stage into the convolutions.
Nothing in the live reference model calls this op (SURVEY.md §2.7) but it is
part of the public op library.
"""

from __future__ import annotations

import math
from typing import Optional

import jax

from threedhumangan_tpu.ops.bias_act import bias_act
from threedhumangan_tpu.ops.upfirdn2d import (
    _filter_size,
    _parse_padding,
    upfirdn2d,
)


def filtered_lrelu(
    x: jax.Array,
    fu: Optional[jax.Array] = None,
    fd: Optional[jax.Array] = None,
    b: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    gain: float = math.sqrt(2.0),
    slope: float = 0.2,
    clamp: Optional[float] = None,
) -> jax.Array:
    """NHWC input; bias broadcast over the channel axis."""
    fu_w, fu_h = _filter_size(fu)
    fd_w, fd_h = _filter_size(fd)
    px0, px1, py0, py1 = _parse_padding(padding)

    if b is not None:
        x = bias_act(x, b, axis=-1, act="linear")

    # upsample
    px0 += (fu_w + up - 1) // 2
    px1 += (fu_w - up) // 2
    py0 += (fu_h + up - 1) // 2
    py1 += (fu_h - up) // 2
    x = upfirdn2d(x, fu, up=up, padding=(px0, px1, py0, py1), gain=up * up)

    # leaky relu + gain + clamp
    x = bias_act(x, None, act="lrelu", alpha=slope, gain=gain, clamp=clamp)

    # downsample
    dx0 = (fd_w - down + 1) // 2
    dx1 = (fd_w - down) // 2
    dy0 = (fd_h - down + 1) // 2
    dy1 = (fd_h - down) // 2
    x = upfirdn2d(x, fd, down=down, padding=(dx0, dx1, dy0, dy1))
    return x
