"""CIPS-style modulated linear layers.

Behavioural parity with reference ``lib/components/cips_layers.py``
(:33-294): ``ModulatedLinear`` (global-style StyleGAN2 demodulated linear),
``StyleModLayer`` (per-pixel style with bmm/group-conv paths — here one
einsum-free refactor, same math as synthesis.SpatialStyleModLayer), and
``AttentionLinear`` (style-attended mixture of K weight banks).  The
reference imports these in mapping_networks.py:9 but no class sits in the
live model path (SURVEY.md §2.6); they are provided for library parity and
for the CIPS-variant experiments the reference's config hooks allow.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from threedhumangan_tpu.utils.misc import kaiming_normal_linear, uniform_init


def init_modulated_linear(key, in_dim, out_dim, style_dim, demodulate=True):
    kw, ka, kab = jax.random.split(key, 3)
    scale = 1.0 / math.sqrt(in_dim)
    return {
        "weight": scale * jax.random.normal(kw, (in_dim, out_dim)),
        "bias": jnp.zeros((out_dim,)),
        "affine": {
            "w": kaiming_normal_linear(ka, (style_dim, in_dim), fan_in=style_dim),
            "b": jnp.ones((in_dim,)) * 0.0,
        },
    }


def apply_modulated_linear(p, x, style, demodulate=True, eps=1e-8):
    """x: (B, N, in); style: (B, style_dim) global — one style per sample."""
    mod = style @ p["affine"]["w"] + p["affine"]["b"] + 1.0  # (B, in)
    w = p["weight"][None] * mod[:, :, None]  # (B, in, out)
    if demodulate:
        demod = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=1, keepdims=True) + eps)
        w = w * demod
    return jnp.einsum("bni,bio->bno", x, w) + p["bias"]


def init_style_mod_layer(key, in_dim, out_dim, style_dim, demodulate=True):
    """Per-pixel style modulation (ref StyleModLayer) — same parameterization
    as synthesis.SpatialStyleModLayer."""
    from threedhumangan_tpu.models.synthesis import init_spatial_style_mod

    return init_spatial_style_mod(key, in_dim, out_dim, style_dim)


def apply_style_mod_layer(p, x, style, demodulate=True):
    from threedhumangan_tpu.models.synthesis import apply_spatial_style_mod

    return apply_spatial_style_mod(p, x, style, demodulate=demodulate)


def init_attention_linear(key, in_dim, out_dim, style_dim, n_banks: int = 4):
    kw, ka, kb = jax.random.split(key, 3)
    scale = 1.0 / math.sqrt(in_dim)
    return {
        "banks": scale * jax.random.normal(kw, (n_banks, in_dim, out_dim)),
        "bias": jnp.zeros((out_dim,)),
        "attn": {
            "w": kaiming_normal_linear(ka, (style_dim, n_banks), fan_in=style_dim),
            "b": uniform_init(kb, (n_banks,), 1.0 / math.sqrt(style_dim)),
        },
    }


def apply_attention_linear(p, x, style):
    """Mixture-of-weight-banks linear: softmax(style) attends over K banks.
    x: (B, N, in); style: (B, style_dim)."""
    attn = jax.nn.softmax(style @ p["attn"]["w"] + p["attn"]["b"], axis=-1)  # (B, K)
    w = jnp.einsum("bk,kio->bio", attn, p["banks"])  # (B, in, out)
    return jnp.einsum("bni,bio->bno", x, w) + p["bias"]
