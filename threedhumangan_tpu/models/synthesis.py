"""2D synthesis stack: SPADE blocks, modulated per-pixel matmuls, ToRGB.

Behavioural parity with reference ``lib/components/map3d_layers.py`` and the
SynthesisNetwork in ``lib/generators/map3d_generator.py:14-97``:

  SpatialStyleModLayer  (ref map3d_layers.py:25-80)   — per-pixel StyleGAN2
      modulated 1x1 "conv" with demodulation.
  SynthesisBlock        (ref :83-112)
  SpatialAdaptiveBatchNorm2d (ref :115-149) — cross-replica moments via
      pmean (replacing dist.all_reduce), normalizes by *running* stats even
      in training (pinned semantics; SURVEY.md §7 hard-part #6).
  SyncBatchNorm         (ref :162 via nn.SyncBatchNorm) — batch-stat
      normalization with pmean'd moments, differentiable (R1 flows through).
  SPADE2d               (ref :153-190)
  SPADEBlock            (ref :193-238) — spectral-norm 1x1 convs.
  SynthesisInput        (ref :241-275)
  SynthesisStyleInput   (ref :278-327)
  ToRGB                 (ref :330-352)
  SynthesisNetwork      (ref map3d_generator.py:14-97)

TPU-first design decisions:
  * NHWC layout; 1x1 convs are (B·H·W, Cin) x (Cin, Cout) matmuls — the
    ideal MXU shape — written as einsum so XLA fuses the SPADE scale/shift
    into the matmul epilogue.
  * SpatialStyleModLayer never materializes the reference's (B, HW, in, out)
    per-pixel weight tensor (SURVEY.md §7 hard-part #3). Algebra:
        out = ((x·mod) @ W) * rsqrt((mod² @ W²) + eps) + b
    which is two matmuls instead of an O(B·HW·in·out) einsum.
  * Norm running stats and spectral-norm power-iteration vectors live in an
    explicit ``state`` pytree threaded through apply (replica-consistent by
    construction — deterministic update from pmean'd tensors).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from threedhumangan_tpu.utils.misc import (
    kaiming_normal_leaky,
    kaiming_normal_linear,
    normalize_2nd_moment,
    uniform_init,
)

_LRELU = lambda x: jnp.where(x >= 0, x, 0.2 * x)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def init_conv1x1(key, in_dim, out_dim, weight_scale: float = 1.0):
    """1x1 conv params with torch Conv2d default init (kaiming_uniform with
    a=sqrt(5) == uniform(±sqrt(1/fan_in)); bias uniform(±1/sqrt(fan_in)))."""
    kw, kb = jax.random.split(key)
    bound = math.sqrt(1.0 / in_dim)
    return {
        "w": uniform_init(kw, (in_dim, out_dim), bound) * weight_scale,
        "b": uniform_init(kb, (out_dim,), bound),
    }


def init_conv1x1_kaiming_leaky(key, in_dim, out_dim):
    kw, kb = jax.random.split(key)
    return {
        "w": kaiming_normal_leaky(kw, (in_dim, out_dim), fan_in=in_dim),
        "b": uniform_init(kb, (out_dim,), 1.0 / math.sqrt(in_dim)),
    }


def apply_conv1x1(p, x, compute_dtype=jnp.float32):
    """x: (..., Cin) -> (..., Cout).  A pure matmul over flattened pixels.

    Accumulates in f32 but stores the result in ``compute_dtype``: at
    512x256x420 one f32 activation is 1.8 GB/batch and the synthesis stack
    is HBM-bound, so bf16 residency matters more than the last mantissa bits
    (the reference runs this under fp16 AMP, which is strictly worse)."""
    y = jnp.einsum(
        "...i,io->...o", x.astype(compute_dtype), p["w"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return (y + p["b"].astype(jnp.float32)).astype(compute_dtype)


# ---------------------------------------------------------------------------
# spectral norm (replaces torch.nn.utils.spectral_norm on the SPADE convs)
# ---------------------------------------------------------------------------


def init_spectral_state(key, out_dim):
    u = jax.random.normal(key, (out_dim,))
    return {"u": u / (jnp.linalg.norm(u) + 1e-12)}


def spectral_normalize(w2d: jax.Array, state: Dict, train: bool, n_iter: int = 1,
                       eps: float = 1e-12) -> Tuple[jax.Array, Dict]:
    """One power-iteration step (torch semantics: update u,v first when
    training, then sigma = u^T W v).  w2d: (in, out); u: (out,)."""
    u = state["u"]
    w = jax.lax.stop_gradient(w2d)
    if train:
        for _ in range(n_iter):
            v = w @ u
            v = v / (jnp.linalg.norm(v) + eps)
            u = w.T @ v
            u = u / (jnp.linalg.norm(u) + eps)
        u = jax.lax.stop_gradient(u)
    v = w @ u
    v = v / (jnp.linalg.norm(v) + eps)
    sigma = jnp.dot(v, w2d @ u)  # grads flow through w2d here, like torch
    return w2d / sigma, {"u": u}


# ---------------------------------------------------------------------------
# SpatialStyleModLayer (per-pixel modulated matmul with demodulation)
# ---------------------------------------------------------------------------


def init_spatial_style_mod(key, in_channel, out_channel, style_dim):
    kw, ka, kab = jax.random.split(key, 3)
    scale = math.sqrt(2.0 / (1 + 0.2 ** 2)) / math.sqrt(in_channel)  # ref :50
    return {
        "weight": scale * jax.random.normal(kw, (in_channel, out_channel)),
        "bias": jnp.zeros((out_channel,)),
        "affine": {
            "w": kaiming_normal_linear(ka, (style_dim, in_channel), fan_in=style_dim),
            "b": uniform_init(kab, (in_channel,), 1.0 / math.sqrt(style_dim)),
        },
    }


def apply_spatial_style_mod(p, x, style, demodulate=True, eps=1e-8, compute_dtype=jnp.float32):
    """x: (B, N, Cin); style: (B, N, style_dim) or (B, 1, style_dim).

    Refactored from the reference's (B, N, in, out) einsum (map3d_layers.py
    :66-78) into two MXU matmuls; identical math.
    """
    mod = apply_conv1x1(p["affine"], style, compute_dtype) + 1.0  # (B,N,in)
    w = p["weight"].astype(compute_dtype)
    xm = (x * mod).astype(compute_dtype)
    y = jnp.einsum("bni,io->bno", xm, w, preferred_element_type=jnp.float32)
    if demodulate:
        s = jnp.einsum(
            "bni,io->bno", jnp.square(mod).astype(compute_dtype), jnp.square(w),
            preferred_element_type=jnp.float32,
        )
        y = y * jax.lax.rsqrt(s + eps)
    return y + p["bias"].astype(jnp.float32)


def init_synthesis_block(key, in_dim, out_dim, style_dim):
    k1, k2 = jax.random.split(key)
    return {
        "mod1": init_spatial_style_mod(k1, in_dim, out_dim, style_dim),
        "mod2": init_spatial_style_mod(k2, out_dim, out_dim, style_dim),
    }


def apply_synthesis_block(p, x, style, skip=False, compute_dtype=jnp.float32):
    """Pixelwise block (ref map3d_layers.py:83-112); x: (B, N, C)."""
    x_orig = x
    x = _LRELU(apply_spatial_style_mod(p["mod1"], x, style, compute_dtype=compute_dtype))
    out = _LRELU(apply_spatial_style_mod(p["mod2"], x, style, compute_dtype=compute_dtype))
    if skip and out.shape[-1] == x_orig.shape[-1]:
        out = out + x_orig
    return out


# ---------------------------------------------------------------------------
# normalizations
# ---------------------------------------------------------------------------


def _cross_replica_mean(x, axis_name: Optional[str]):
    if axis_name is None:
        return x
    return jax.lax.pmean(x, axis_name)


def init_sync_batch_norm(num_features):
    params = {"scale": jnp.ones((num_features,)), "bias": jnp.zeros((num_features,))}
    state = {
        "mean": jnp.zeros((num_features,)),
        "var": jnp.ones((num_features,)),
        "count": jnp.zeros((), jnp.int32),
    }
    return params, state


def sync_bn_moments(
    state, x, axis_name: Optional[str] = None,
    momentum: float = 0.1, eps: float = 1e-5,
):
    """Train-mode sync-BN moments: cross-replica (pmean'd) differentiable
    batch mean/var of NHWC ``x`` plus the running-stat update (unbiased
    variance, stop-gradient).  Shared by the XLA path
    (apply_sync_batch_norm) and the fused train kernel
    (ops/synthesis_train.py), which takes (mean, rsqrt(var+eps)) as
    differentiable arguments."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 2))
    mean = _cross_replica_mean(mean, axis_name)
    var = jnp.mean(jnp.square(x32 - mean), axis=(0, 1, 2))
    var = _cross_replica_mean(var, axis_name)

    n = x.shape[0] * x.shape[1] * x.shape[2]
    if axis_name is not None:
        n = n * jax.lax.psum(1, axis_name)
    unbiased = jax.lax.stop_gradient(var) * n / max(n - 1, 1)
    new_state = {
        "mean": (1 - momentum) * state["mean"] + momentum * jax.lax.stop_gradient(mean),
        "var": (1 - momentum) * state["var"] + momentum * unbiased,
        "count": state["count"] + 1,
    }
    return mean, var, new_state


def apply_sync_batch_norm(
    params, state, x, train: bool, axis_name: Optional[str] = None,
    momentum: float = 0.1, eps: float = 1e-5,
):
    """nn.SyncBatchNorm semantics (ref map3d_layers.py:162): in training,
    normalize by cross-replica *batch* stats (differentiable — R1 double
    grads flow through the moments); running stats updated with unbiased
    variance.  x: NHWC."""
    in_dtype = x.dtype
    x = x.astype(jnp.float32)  # stats in f32 regardless of residency dtype
    if train:
        mean, var, new_state = sync_bn_moments(state, x, axis_name, momentum, eps)
    else:
        mean, var = state["mean"], state["var"]
        new_state = state

    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"] + params["bias"]
    return y.astype(in_dtype), new_state


def init_adaptive_batch_norm(num_features):
    state = {
        "mean": jnp.zeros((num_features,)),
        "var": jnp.ones((num_features,)),
        "count": jnp.zeros((), jnp.int32),
    }
    return {}, state


def apply_adaptive_batch_norm(
    params, state, x, train: bool, axis_name: Optional[str] = None,
    momentum: float = 0.05, eps: float = 1e-5,
):
    """SpatialAdaptiveBatchNorm2d (ref map3d_layers.py:115-149): running
    stats are updated under no_grad each training step (cross-replica mean
    of unbiased batch moments), but normalization ALWAYS uses the running
    stats — so gradients never flow through the moments."""
    if train:
        xs = jax.lax.stop_gradient(x).astype(jnp.float32)
        mean = jnp.mean(xs, axis=(0, 1, 2))
        n = xs.shape[0] * xs.shape[1] * xs.shape[2]
        var = jnp.sum(jnp.square(xs - mean), axis=(0, 1, 2)) / max(n - 1, 1)
        mean = _cross_replica_mean(mean, axis_name)
        var = _cross_replica_mean(var, axis_name)
        new_mean = state["mean"] + (mean - state["mean"]) * momentum
        new_var = state["var"] + (var - state["var"]) * momentum
        new_state = {"mean": new_mean, "var": new_var, "count": state["count"] + 1}
    else:
        new_state = state
    y = (x.astype(jnp.float32) - new_state["mean"]) * jax.lax.rsqrt(new_state["var"] + eps)
    return y.astype(x.dtype), new_state


def instance_norm(x, eps: float = 1e-5):
    """nn.InstanceNorm2d default (no affine, no running stats); x NHWC."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


# ---------------------------------------------------------------------------
# SPADE
# ---------------------------------------------------------------------------

_SPADE_HIDDEN = 128  # ref map3d_layers.py:168


def init_spade2d(key, input_dim, feature_dim, normalization="instance_norm"):
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "mlp_shared": init_conv1x1(k1, feature_dim, _SPADE_HIDDEN),
        "mlp_gamma": init_conv1x1(k2, _SPADE_HIDDEN, input_dim),
        "mlp_beta": init_conv1x1(k3, _SPADE_HIDDEN, input_dim),
    }
    state = {}
    if normalization == "batch_norm":
        params["norm"], state["norm"] = init_sync_batch_norm(input_dim)
    elif normalization == "adaptive_batch_norm":
        params["norm"], state["norm"] = init_adaptive_batch_norm(input_dim)
    return params, state


def apply_spade2d(
    params, state, x, feature_maps, normalization, train: bool,
    axis_name=None, compute_dtype=jnp.float32,
):
    """x, feature_maps: NHWC.  (ref map3d_layers.py:176-190)"""
    new_state = dict(state)
    if normalization == "instance_norm":
        normalized = instance_norm(x)
    elif normalization == "batch_norm":
        normalized, new_state["norm"] = apply_sync_batch_norm(
            params["norm"], state["norm"], x, train, axis_name)
    elif normalization == "adaptive_batch_norm":
        normalized, new_state["norm"] = apply_adaptive_batch_norm(
            params["norm"], state["norm"], x, train, axis_name)
    else:
        normalized = x

    actv = jax.nn.relu(apply_conv1x1(params["mlp_shared"], feature_maps, compute_dtype))
    gamma = 1.0 + apply_conv1x1(params["mlp_gamma"], actv, compute_dtype)

    if normalization == "none":
        gamma = normalize_2nd_moment(gamma, axis=-1)
        out = normalized * gamma
    else:
        beta = apply_conv1x1(params["mlp_beta"], actv, compute_dtype)
        out = normalized * gamma + beta
    return out, new_state


def init_spade_block(key, in_dim, out_dim, style_dim, normalization="instance_norm"):
    k0, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
    params = {"conv_0": init_conv1x1(k0, in_dim, out_dim),
              "conv_1": init_conv1x1(k1, out_dim, out_dim)}
    state = {"conv_0": init_spectral_state(k4, out_dim),
             "conv_1": init_spectral_state(k5, out_dim)}
    params["spade_0"], state["spade_0"] = init_spade2d(k2, in_dim, style_dim, normalization)
    params["spade_1"], state["spade_1"] = init_spade2d(k3, out_dim, style_dim, normalization)
    return params, state


def apply_spade_block(
    params, state, x, style, normalization, skip=False, train=False,
    axis_name=None, compute_dtype=jnp.float32,
):
    """x: NHWC; style: NHWC spatial map or (B, 1, C) global vector
    (ref map3d_layers.py:218-238)."""
    B, H, W, _ = x.shape
    if style.ndim == 3:
        # (B, 1, C) global style: keep it (B, 1, 1, C) through the SPADE
        # MLPs — the per-pixel MLP on broadcast rows is rank-1 over pixels,
        # so running it pre-broadcast is the same math at 1/(H*W) the FLOPs
        # (isolated mode runs 6 of 9 blocks this way; ~30% of the training
        # synthesis FLOPs).  gamma/beta broadcast in the modulation instead.
        style = style[:, :, None, :]

    new_state = {}
    x_orig = x

    x, new_state["spade_0"] = apply_spade2d(
        params["spade_0"], state["spade_0"], x, style, normalization, train, axis_name, compute_dtype)
    x = _LRELU(x)
    w0, new_state["conv_0"] = spectral_normalize(params["conv_0"]["w"], state["conv_0"], train)
    x = apply_conv1x1({"w": w0, "b": params["conv_0"]["b"]}, x, compute_dtype)

    x, new_state["spade_1"] = apply_spade2d(
        params["spade_1"], state["spade_1"], x, style, normalization, train, axis_name, compute_dtype)
    x = _LRELU(x)
    w1, new_state["conv_1"] = spectral_normalize(params["conv_1"]["w"], state["conv_1"], train)
    x = apply_conv1x1({"w": w1, "b": params["conv_1"]["b"]}, x, compute_dtype)

    if skip and x.shape[-1] == x_orig.shape[-1]:
        x = x + x_orig
    return x, new_state


def apply_spade_block_fused(
    params, state, x, style, fixed_row, skip=False, axis_name=None,
    compute_dtype=jnp.bfloat16, tile_rows: Optional[int] = None,
    interpret: bool = False,
):
    """apply_spade_block (batch_norm, train=True) on the fused Pallas
    half-block kernels (ops/synthesis_train.py).

    Moments (+pmean), spectral norm and running-stat/state updates stay in
    this XLA frame — semantics identical to the per-op path; the
    normalize/modulate/activate/conv chain runs per pixel tile in VMEM
    with a custom VJP.  ``style``: (B, H, W, Cs) spatial map, or a global
    (B, 1, Cs) vector (rank-1 gamma/beta path); ``fixed_row``: optional
    (B, Cs) row added to a spatial style in-kernel (mixed/all modes).
    ``tile_rows=None`` sizes each half-block's pixel tile from the
    scoped-VMEM model (ops/synthesis_train.auto_tile_rows).
    """
    from threedhumangan_tpu.ops.synthesis_train import (
        spade_half_block_rank1,
        spade_half_block_spatial,
    )

    B = x.shape[0]
    new_state = {}
    x_orig = x
    h = x.astype(compute_dtype)

    for si, cname in ((0, "conv_0"), (1, "conv_1")):
        sp = params[f"spade_{si}"]
        mean, var, ns_norm = sync_bn_moments(
            state[f"spade_{si}"]["norm"], h, axis_name)
        new_state[f"spade_{si}"] = {"norm": ns_norm}
        r = jax.lax.rsqrt(var + 1e-5)
        w_bar, new_state[cname] = spectral_normalize(
            params[cname]["w"], state[cname], train=True)

        if style.ndim == 4:
            mlp = {
                "sh_w": sp["mlp_shared"]["w"], "sh_b": sp["mlp_shared"]["b"],
                "g_w": sp["mlp_gamma"]["w"], "g_b": sp["mlp_gamma"]["b"],
                "bt_w": sp["mlp_beta"]["w"], "bt_b": sp["mlp_beta"]["b"],
            }
            h = spade_half_block_spatial(
                h, style.astype(compute_dtype), fixed_row,
                mean, r, sp["norm"]["scale"], sp["norm"]["bias"],
                mlp, w_bar, params[cname]["b"],
                tile_rows=tile_rows, compute_dtype=compute_dtype,
                interpret=interpret)
        else:
            # global style: the SPADE MLP output is rank-1 over pixels —
            # run it pre-broadcast here (differentiable, tiny) and ship
            # per-image gamma/beta rows
            srow = style.reshape(B, 1, -1)
            actv = jax.nn.relu(apply_conv1x1(sp["mlp_shared"], srow, compute_dtype))
            gam = 1.0 + apply_conv1x1(sp["mlp_gamma"], actv, compute_dtype)
            bet = apply_conv1x1(sp["mlp_beta"], actv, compute_dtype)
            h = spade_half_block_rank1(
                h, gam.reshape(B, -1), bet.reshape(B, -1),
                mean, r, sp["norm"]["scale"], sp["norm"]["bias"],
                w_bar, params[cname]["b"],
                tile_rows=tile_rows, compute_dtype=compute_dtype,
                interpret=interpret)

    if skip and h.shape[-1] == x_orig.shape[-1]:
        h = h + x_orig
    return h, new_state


# ---------------------------------------------------------------------------
# inputs / ToRGB
# ---------------------------------------------------------------------------


def get_2d_coords(batch_size, height, width, dtype=jnp.float32):
    """(B, H, W, 2) grid with i (row) then j (col) channels, both in [-1, 1]
    (ref map3d_layers.py:260-269)."""
    i = jnp.linspace(-1.0, 1.0, height, dtype=dtype)
    j = jnp.linspace(-1.0, 1.0, width, dtype=dtype)
    gi, gj = jnp.meshgrid(i, j, indexing="ij")
    coords = jnp.stack([gi, gj], axis=-1)
    return jnp.broadcast_to(coords[None], (batch_size, height, width, 2))


def init_synthesis_input(key, input_dim, output_dim, num_layers=1):
    """Fourier-feature input head (ref map3d_layers.py:241-257)."""
    keys = jax.random.split(key, num_layers)
    kw, kb = jax.random.split(keys[0])
    first = {
        "w": uniform_init(kw, (input_dim, output_dim), math.sqrt(9.0 / input_dim)),
        "b": uniform_init(kb, (output_dim,), 1.0 / math.sqrt(input_dim)),
    }
    rest = [init_conv1x1_kaiming_leaky(keys[i], output_dim, output_dim)
            for i in range(1, num_layers)]
    return {"first": first, "rest": rest}


def apply_synthesis_input(p, coords, compute_dtype=jnp.float32):
    x = jnp.sin(apply_conv1x1(p["first"], coords, compute_dtype))
    for layer in p["rest"]:
        x = _LRELU(apply_conv1x1(layer, x, compute_dtype))
    return x


def init_synthesis_style_input(key, input_dim, latent_dim, output_dim, num_layers=3):
    """Condition-image style head, used when disable_render
    (ref map3d_layers.py:278-327)."""
    keys = jax.random.split(key, num_layers)
    kw, kb = jax.random.split(keys[0])
    from_coords = {
        "w": uniform_init(kw, (input_dim, latent_dim), math.sqrt(9.0 / input_dim)),
        "b": uniform_init(kb, (latent_dim,), 1.0 / math.sqrt(input_dim)),
    }
    network = [init_conv1x1_kaiming_leaky(keys[1], latent_dim * 2, output_dim)]
    for i in range(1, num_layers - 1):
        network.append(init_conv1x1_kaiming_leaky(keys[1 + i], output_dim, output_dim))
    return {"from_coords": from_coords, "network": network}


def apply_synthesis_style_input(p, coords, latent, compute_dtype=jnp.float32):
    """coords: NHWC condition image; latent: (B, latent_dim)."""
    B, H, W, _ = coords.shape
    latent = normalize_2nd_moment(latent, axis=-1)
    ff = jnp.sin(apply_conv1x1(p["from_coords"], coords, compute_dtype))
    lat = jnp.broadcast_to(latent[:, None, None, :], (B, H, W, latent.shape[-1]))
    x = jnp.concatenate([ff, lat.astype(ff.dtype)], axis=-1)
    for layer in p["network"]:
        x = _LRELU(apply_conv1x1(layer, x, compute_dtype))
    return x


def init_to_rgb(key, in_dim, dim_rgb=3):
    p = init_conv1x1(key, in_dim, dim_rgb)
    p["w"] = p["w"] * 0.25  # ref map3d_layers.py:343-344
    return p


def apply_to_rgb(p, x, rgb=None, compute_dtype=jnp.float32):
    out = apply_conv1x1(p, x, compute_dtype)
    if rgb is not None:
        out = out + rgb
    return out


# ---------------------------------------------------------------------------
# SynthesisNetwork
# ---------------------------------------------------------------------------


def init_synthesis_network(
    key,
    input_dim,
    style_dim,
    hidden_dim=256,
    num_blocks=8,
    mod_blocks=tuple(range(8)),
    spatial_normalization="instance_norm",
    map3d_mode="isolated",
):
    """(ref map3d_generator.py:19-55)"""
    keys = jax.random.split(key, 2 * num_blocks)
    blocks, to_rgbs, states = [], [], []
    in_dim = input_dim
    for i in range(num_blocks):
        if spatial_normalization == "none":
            bp = init_synthesis_block(keys[2 * i], in_dim, hidden_dim, style_dim)
            bs = {}
        else:
            bp, bs = init_spade_block(keys[2 * i], in_dim, hidden_dim, style_dim, spatial_normalization)
        blocks.append(bp)
        states.append(bs)
        to_rgbs.append(init_to_rgb(keys[2 * i + 1], hidden_dim))
        in_dim = hidden_dim
    params = {"blocks": blocks, "to_rgbs": to_rgbs}
    meta = {
        "num_blocks": num_blocks,
        "mod_blocks": tuple(mod_blocks),
        "spatial_normalization": spatial_normalization,
        "map3d_mode": map3d_mode,
    }
    return params, {"blocks": states}, meta


def apply_synthesis_network(
    params, state, meta, x, style, fixed_style, rgb=None,
    train=False, axis_name=None, compute_dtype=jnp.float32, return_internal=False,
    remat=False,
):
    """(ref map3d_generator.py:58-97)

    x: NHWC input features; style: NHWC spatial style (3D render features);
    fixed_style: (B, num_ws=1, C) global style.
    Returns (output dict with 'final' NHWC rgb, new_state).
    """
    num_blocks = meta["num_blocks"]
    mod_blocks = set(meta["mod_blocks"])
    mode = meta["map3d_mode"]
    norm = meta["spatial_normalization"]

    # fused train-mode half-block kernels (ops/synthesis_train.py): batch
    # moments/spectral-norm/skip/ToRGB stay here, the per-pixel chain runs
    # in VMEM with a custom VJP
    fused = (meta.get("fused_train", False) and train and norm == "batch_norm")
    pixelwise = norm == "none"
    if pixelwise:
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        style = style.reshape(B, H * W, style.shape[-1])

    output = {}
    new_block_states = []

    for idx in range(num_blocks):
        fixed_row = None  # (B, C) row added to a spatial style in-kernel
        if mode == "all":
            fs = fixed_style[:, 0]  # (B, C)
            if fused:
                input_style, fixed_row = style, fs
            elif style.ndim == 4:
                input_style = style + fs[:, None, None, :]
            else:
                input_style = style + fs[:, None, :]
        elif mode == "mixed":
            fs = fixed_style[:, 0]
            if idx not in mod_blocks:
                # zeros_like(style) + fs is just fs broadcast: keep it as a
                # (B, 1, C) global vector so the SPADE MLPs run pre-broadcast
                input_style = fs[:, None, :]
            elif fused:
                input_style, fixed_row = style, fs
            elif style.ndim == 4:
                input_style = style + fs[:, None, None, :]
            else:
                input_style = style + fs[:, None, :]
        elif mode == "isolated":
            input_style = style if idx in mod_blocks else fixed_style
        else:
            raise ValueError("invalid map3d_mode")

        skip = idx >= num_blocks // 2
        if fused:
            block_fn = functools.partial(
                apply_spade_block_fused, skip=skip, axis_name=axis_name,
                compute_dtype=compute_dtype,
                tile_rows=meta.get("fused_tile_rows", None),
                interpret=meta.get("fused_interpret", False))
            if remat:
                block_fn = jax.checkpoint(block_fn)
            x, bs = block_fn(params["blocks"][idx], state["blocks"][idx],
                             x, input_style, fixed_row)
            new_block_states.append(bs)
        elif pixelwise:
            block_fn = functools.partial(
                apply_synthesis_block, skip=skip, compute_dtype=compute_dtype)
            if remat:
                block_fn = jax.checkpoint(block_fn)
            x = block_fn(params["blocks"][idx], x, input_style)
            new_block_states.append({})
        else:
            block_fn = functools.partial(
                apply_spade_block, normalization=norm,
                skip=skip, train=train, axis_name=axis_name, compute_dtype=compute_dtype)
            if remat:
                # recompute block activations in the backward pass — at
                # 512x256x420 each block's residuals are ~GB-scale
                block_fn = jax.checkpoint(block_fn)
            x, bs = block_fn(params["blocks"][idx], state["blocks"][idx], x, input_style)
            new_block_states.append(bs)

        if idx >= num_blocks // 2 - 1:
            rgb = apply_to_rgb(params["to_rgbs"][idx], x, rgb, compute_dtype)

        if return_internal:
            output[f"block_{idx}_feature_map"] = x
            output[f"block_{idx}_rgb"] = rgb

    if pixelwise:
        rgb = rgb.reshape(B, H, W, 3)

    output["final"] = rgb
    return output, {"blocks": new_block_states}
