"""FiLM-conditioned SIREN neural field (the 3D pose-mapping network).

Behavioural parity with reference ``lib/implicit_funcitions/modulated.py``
(COORDCONCATSIREN) and ``lib/components/pigan_layers.py`` (SineLayer :63-71,
FiLMLayer :74-87, inits :17-60):

  * two first layers — coords (omega_0=30) and 31-d geo features — are
    concatenated (ref modulated.py:17-20, 56-58);
  * ``num_blocks`` FiLM trunk layers driven by per-layer slices of
    (freq, phase), with freq = raw*15 + 30 (ref :43, 60-63);
  * heads: sigma (:65), view-dependent color via FiLM over [ray_dirs, x]
    then sigmoid (:67-70), a ``feature_dim`` feature head (:71);
  * output concat [rgb(3), features, sigma(1)] (:73).  Note the color FiLM
    layer reuses the *last* trunk slice of (freq, phase) — a reference quirk
    kept for checkpoint parity.

TPU-first: the whole field is 7 matmuls over a (B*P, C) matrix with P padded
to MXU tiles; params are a flat dict so the fused Pallas ray-march kernel
(ops/raymarch.py) can consume the same pytree.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from threedhumangan_tpu.utils.misc import (
    first_layer_sine_bound,
    frequency_init_bound,
    uniform_init,
)


def _linear_init(key, in_dim, out_dim, w_bound, dtype=jnp.float32):
    """Linear params: weight uniform(±w_bound), bias = torch nn.Linear
    default uniform(±1/sqrt(fan_in)) (the reference inits only touch
    weights; biases keep the torch default)."""
    kw, kb = jax.random.split(key)
    return {
        "w": uniform_init(kw, (in_dim, out_dim), w_bound, dtype),
        "b": uniform_init(kb, (out_dim,), 1.0 / math.sqrt(in_dim), dtype),
    }


def init_coordconcat_siren(
    key,
    input_dim: int = 3,
    hidden_dim: int = 256,
    geo_feature_dim: int = 31,
    feature_dim: int = 384,
    num_blocks: int = 4,
    dtype=jnp.float32,
) -> Dict:
    keys = jax.random.split(key, num_blocks + 6)
    freq25 = lambda fi: frequency_init_bound(fi, 25.0)

    params = {
        "first_coord": _linear_init(keys[0], input_dim, hidden_dim, first_layer_sine_bound(input_dim), dtype),
        "first_mod": _linear_init(keys[1], geo_feature_dim, hidden_dim, first_layer_sine_bound(geo_feature_dim), dtype),
        "network": [],
        "sigma": _linear_init(keys[2], hidden_dim, 1, freq25(hidden_dim), dtype),
        "color_sine": _linear_init(keys[3], hidden_dim + 3, hidden_dim, freq25(hidden_dim + 3), dtype),
        "color_linear": _linear_init(keys[4], hidden_dim, 3, freq25(hidden_dim), dtype),
        "feature_linear": _linear_init(keys[5], hidden_dim, feature_dim, freq25(hidden_dim), dtype),
    }
    in_dims = [2 * hidden_dim] + [hidden_dim] * (num_blocks - 1)
    for i, in_dim in enumerate(in_dims):
        params["network"].append(_linear_init(keys[6 + i], in_dim, hidden_dim, freq25(in_dim), dtype))
    return params


def _lin(p, x, compute_dtype):
    return (
        jnp.dot(x.astype(compute_dtype), p["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32)
        + p["b"].astype(jnp.float32)
    )


def apply_coordconcat_siren(
    params: Dict,
    points: jax.Array,
    frequencies: jax.Array,
    phase_shifts: jax.Array,
    geo_feature: jax.Array,
    ray_directions: jax.Array,
    input_scaler: float = 1.0,
    geo_feature_scaler: float = 1.0,
    compute_dtype=jnp.float32,
    fast_math: bool = False,
    **_ignored,
) -> jax.Array:
    """Evaluate the field.

    points/geo_feature/ray_directions: (B, P, ·); frequencies/phase_shifts:
    (B, num_blocks*hidden).  Returns (B, P, 3 + feature_dim + 1).

    ``fast_math`` swaps the exact sine for the range-reduced polynomial
    (ops.raymarch.fast_sin, max err ~5e-5): the SIREN is transcendental-bound
    on TPU (sin measures ~27 G/s vs 74+ TFLOP/s matmuls on v5e), and the
    polynomial is fully differentiable so the training path can use it too.
    """
    hidden_dim = params["first_coord"]["w"].shape[1]
    if fast_math:
        from threedhumangan_tpu.ops.raymarch import fast_sin as _sin
    else:
        _sin = jnp.sin

    frequencies = frequencies * 15.0 + 30.0
    x_in = points * input_scaler
    geo = geo_feature * geo_feature_scaler

    x1 = _sin(30.0 * _lin(params["first_coord"], x_in, compute_dtype))
    x2 = _sin(30.0 * _lin(params["first_mod"], geo, compute_dtype))
    x = jnp.concatenate([x1, x2], axis=-1)

    for i, layer in enumerate(params["network"]):
        lo, hi = i * hidden_dim, (i + 1) * hidden_dim
        f = frequencies[:, None, lo:hi]
        p = phase_shifts[:, None, lo:hi]
        x = _sin(f * _lin(layer, x, compute_dtype) + p)

    sigma = _lin(params["sigma"], x, compute_dtype)

    xc = jnp.concatenate([ray_directions.astype(x.dtype), x], axis=-1)
    f = frequencies[:, None, -hidden_dim:]
    p = phase_shifts[:, None, -hidden_dim:]
    xc = _sin(f * _lin(params["color_sine"], xc, compute_dtype) + p)

    rgb = jax.nn.sigmoid(_lin(params["color_linear"], xc, compute_dtype))
    feat = _lin(params["feature_linear"], xc, compute_dtype)

    return jnp.concatenate([rgb, feat, sigma], axis=-1)


NEURAL_FIELD_REGISTRY = {
    "COORDCONCATSIREN": (init_coordconcat_siren, apply_coordconcat_siren),
}
