"""Latent mapping networks.

Behavioural parity with reference ``lib/components/mapping_networks.py``:
  MappingNetwork          (ref :13-41) — 4-layer lrelu MLP over the
      2nd-moment-normalized latent; output splits into (freq, phase);
      final weight scaled by 0.25 at init.
  FullyConnectedLayer     (ref :92-121) — StyleGAN2 equalized-lr linear:
      weight stored as randn/lr_mul, runtime gain lr_mul/sqrt(fan_in).
  TwoPartMappingNetwork   (ref :124-216) — shared trunk (7 layers), an
      implicit branch (1-d, unused downstream) and a synthesis-style branch
      broadcast to (B, num_ws, w_dim).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from threedhumangan_tpu.ops.bias_act import bias_act
from threedhumangan_tpu.utils.misc import (
    kaiming_normal_leaky,
    kaiming_normal_linear,
    normalize_2nd_moment,
    uniform_init,
)


# ---------------------------------------------------------------------------
# MappingNetwork (pi-GAN style): z -> (freq, phase)
# ---------------------------------------------------------------------------


def init_mapping_network(key, latent_dim: int, map_hidden_dim: int, map_output_dim: int) -> Dict:
    dims = [latent_dim, map_hidden_dim, map_hidden_dim, map_hidden_dim, map_output_dim]
    layers = []
    keys = jax.random.split(key, len(dims) - 1)
    for i in range(len(dims) - 1):
        kw, kb = jax.random.split(keys[i])
        w = kaiming_normal_leaky(kw, (dims[i], dims[i + 1]), fan_in=dims[i])
        if i == len(dims) - 2:
            w = w * 0.25  # ref mapping_networks.py:30-31
        b = uniform_init(kb, (dims[i + 1],), 1.0 / math.sqrt(dims[i]))
        layers.append({"w": w, "b": b})
    return {"layers": layers}


def apply_mapping_network(params: Dict, z: jax.Array, compute_dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    x = normalize_2nd_moment(z.astype(jnp.float32))
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        x = jnp.dot(x.astype(compute_dtype), layer["w"].astype(compute_dtype),
                    preferred_element_type=jnp.float32) + layer["b"]
        if i < n - 1:
            x = jnp.where(x >= 0, x, 0.2 * x)
    half = x.shape[-1] // 2
    return x[..., :half], x[..., half:]


# ---------------------------------------------------------------------------
# TwoPartMappingNetwork_ (legacy, plain-linear variant; ref :44-89 — dead in
# the reference live path, kept for public-surface parity)
# ---------------------------------------------------------------------------


def init_two_part_mapping_network_legacy(
    key,
    latent_dim: int,
    map_hidden_dim: int,
    implicit_output_dim: int,
    superres_output_dim: int,
    trunk_layers: int = 4,
    branch_layers: int = 4,
    normalize: bool = False,
) -> Dict:
    """Legacy ``TwoPartMappingNetwork_`` (ref mapping_networks.py:44-89):
    plain kaiming-init linears (no equalized lr), trunk of
    ``trunk_layers + 1`` lrelu layers, two branches of ``branch_layers``
    layers; the implicit branch's final weight is scaled by 0.25."""
    n_trunk = trunk_layers + 1
    keys = jax.random.split(key, n_trunk + 2 * branch_layers)
    ki = 0

    def linear(k, din, dout, linear_init=False):
        kw, kb = jax.random.split(k)
        if linear_init:
            w = kaiming_normal_linear(kw, (din, dout), fan_in=din)
        else:
            w = kaiming_normal_leaky(kw, (din, dout), fan_in=din)
        b = uniform_init(kb, (dout,), 1.0 / math.sqrt(din))
        return {"w": w, "b": b}

    trunk = []
    dims = [latent_dim] + [map_hidden_dim] * n_trunk
    for i in range(n_trunk):
        trunk.append(linear(keys[ki], dims[i], dims[i + 1]))
        ki += 1

    implicit = []
    idims = [map_hidden_dim] * branch_layers + [implicit_output_dim]
    for i in range(branch_layers):
        p = linear(keys[ki], idims[i], idims[i + 1])
        ki += 1
        if i == branch_layers - 1:
            p["w"] = p["w"] * 0.25  # ref :67-68
        implicit.append(p)

    superres = []
    sdims = [map_hidden_dim] * branch_layers + [superres_output_dim]
    for i in range(branch_layers):
        # ref :76: the superres branch uses kaiming *linear* init throughout
        superres.append(linear(keys[ki], sdims[i], sdims[i + 1], linear_init=True))
        ki += 1

    return {"trunk": trunk, "implicit": implicit, "superres": superres,
            "normalize": jnp.asarray(normalize)}


def apply_two_part_mapping_network_legacy(
    params: Dict, z: jax.Array, compute_dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array]:
    """Forward of the legacy network (ref :81-89).  Trunk layers all end in
    lrelu; branch layers lrelu except the last (linear)."""

    def lrelu(x):
        return jnp.where(x >= 0, x, 0.2 * x)

    def run(layers, x, final_linear):
        n = len(layers)
        for i, layer in enumerate(layers):
            x = jnp.dot(x.astype(compute_dtype), layer["w"].astype(compute_dtype),
                        preferred_element_type=jnp.float32) + layer["b"]
            if not (final_linear and i == n - 1):
                x = lrelu(x)
        return x

    x = z.astype(jnp.float32)
    x = jnp.where(params["normalize"], normalize_2nd_moment(x), x)
    x = run(params["trunk"], x, final_linear=False)
    implicit_styles = run(params["implicit"], x, final_linear=True)
    superres_styles = run(params["superres"], x, final_linear=True)
    return implicit_styles, superres_styles


# ---------------------------------------------------------------------------
# TwoPartMappingNetwork (StyleGAN2 style)
# ---------------------------------------------------------------------------


def _init_fc(key, in_features, out_features, lr_multiplier=1.0, bias_init=0.0):
    """Equalized-lr linear (ref FullyConnectedLayer :92-107)."""
    return {
        "w": jax.random.normal(key, (out_features, in_features)) / lr_multiplier,
        "b": jnp.full((out_features,), float(bias_init), jnp.float32),
        # static gains folded in at apply time
        "w_gain": jnp.asarray(lr_multiplier / math.sqrt(in_features), jnp.float32),
        "b_gain": jnp.asarray(lr_multiplier, jnp.float32),
    }


def _apply_fc(p, x, activation="linear", compute_dtype=jnp.float32):
    # gains are equalized-lr constants, not trainables (stop_gradient keeps
    # their grads zero so Adam never moves them)
    w_gain = jax.lax.stop_gradient(p["w_gain"])
    b_gain = jax.lax.stop_gradient(p["b_gain"])
    w = (p["w"] * w_gain).astype(compute_dtype)
    b = p["b"] * b_gain
    y = jnp.dot(x.astype(compute_dtype), w.T, preferred_element_type=jnp.float32)
    return bias_act(y, b.astype(jnp.float32), axis=-1, act=activation)


def init_two_part_mapping_network(
    key,
    z_dim: int,
    w_dim: int,
    implicit_dim: int = 1,
    num_ws: int = 1,
    trunk_layers: int = 7,
    branch_layers: int = 1,
    lr_multiplier: float = 0.01,
) -> Dict:
    keys = jax.random.split(key, trunk_layers + 2 * branch_layers)
    ki = 0

    trunk = []
    dims = [z_dim] + [w_dim] * trunk_layers
    for i in range(trunk_layers):
        trunk.append(_init_fc(keys[ki], dims[i], dims[i + 1], lr_multiplier))
        ki += 1

    implicit = []
    idims = [w_dim] * branch_layers + [implicit_dim]
    for i in range(branch_layers):
        p = _init_fc(keys[ki], idims[i], idims[i + 1], lr_multiplier)
        ki += 1
        if i == branch_layers - 1:
            p["w_gain"] = p["w_gain"] * 0.2  # ref :175
        implicit.append(p)

    superres = []
    sdims = [w_dim] * branch_layers + [w_dim]
    for i in range(branch_layers):
        superres.append(_init_fc(keys[ki], sdims[i], sdims[i + 1], lr_multiplier))
        ki += 1

    # note: only array leaves here — static config must stay out of the
    # params pytree or jax.grad rejects the integer leaves
    return {"trunk": trunk, "implicit": implicit, "superres": superres}


def apply_two_part_mapping_network(
    params: Dict, z: jax.Array, compute_dtype=jnp.float32, num_ws: int = 1
) -> Tuple[jax.Array, jax.Array]:
    """Returns (implicit_styles (B, implicit_dim), synthesis_styles
    (B, num_ws, w_dim))."""
    x = normalize_2nd_moment(z.astype(jnp.float32))
    for layer in params["trunk"]:
        x = _apply_fc(layer, x, "lrelu", compute_dtype)

    xi = x
    n_branch = len(params["implicit"])
    for i, layer in enumerate(params["implicit"]):
        act = "linear" if i == n_branch - 1 else "lrelu"
        xi = _apply_fc(layer, xi, act, compute_dtype)

    xs = x
    for layer in params["superres"]:
        xs = _apply_fc(layer, xs, "lrelu", compute_dtype)

    if num_ws is not None:
        xs = jnp.broadcast_to(xs[:, None, :], (xs.shape[0], num_ws, xs.shape[-1]))
    return xi, xs
