"""Fused bias + activation (+ gain + clamp).

Public-surface parity with the reference's ``bias_act`` plugin
(lib/components/ops/bias_act.py:91-120 reference path; CUDA kernel at
ops/bias_act.cu).  On TPU this is a single XLA fusion — the elementwise chain
fuses into the producing matmul's epilogue, so no custom kernel is needed,
and JAX provides arbitrary-order autodiff natively (the reference's custom
1st/2nd-order grad kernels at bias_act.py:126-207 are unnecessary here).

The activation registry (names, default alpha/gain) matches the reference's
``activation_funcs`` table so checkpoints / configs naming activations port
directly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class _Act:
    fn: Callable
    def_alpha: float
    def_gain: float


_SQRT2 = math.sqrt(2.0)

activation_funcs = {
    "linear": _Act(lambda x, a: x, 0.0, 1.0),
    "relu": _Act(lambda x, a: jnp.maximum(x, 0.0), 0.0, _SQRT2),
    "lrelu": _Act(lambda x, a: jnp.where(x >= 0, x, x * a), 0.2, _SQRT2),
    "tanh": _Act(lambda x, a: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": _Act(lambda x, a: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": _Act(lambda x, a: jax.nn.elu(x), 0.0, 1.0),
    "selu": _Act(lambda x, a: jax.nn.selu(x), 0.0, 1.0),
    "softplus": _Act(lambda x, a: jax.nn.softplus(x), 0.0, 1.0),
    "swish": _Act(lambda x, a: jax.nn.silu(x), 0.0, _SQRT2),
}


def bias_act(
    x: jax.Array,
    b: Optional[jax.Array] = None,
    axis: int = -1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jax.Array:
    """y = clamp(gain * act(x + broadcast(b, axis)), ±clamp).

    Note: ``axis`` defaults to -1 (channels-last, TPU layout) where the
    reference's ``dim`` defaults to 1 (NCHW).
    """
    spec = activation_funcs[act]
    alpha = spec.def_alpha if alpha is None else float(alpha)
    gain = spec.def_gain if gain is None else float(gain)
    clamp = -1.0 if clamp is None else float(clamp)
    assert clamp >= 0 or clamp == -1.0

    if b is not None:
        assert b.ndim == 1
        shape = [1] * x.ndim
        shape[axis] = b.shape[0]
        x = x + b.reshape(shape).astype(x.dtype)

    x = spec.fn(x, alpha)
    if gain != 1.0:
        x = x * jnp.asarray(gain, x.dtype)
    if clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x
