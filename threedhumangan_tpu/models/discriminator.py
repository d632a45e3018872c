"""OASIS-style U-Net segmentation discriminator.

Behavioural parity with reference ``lib/discriminators/unet_discriminators.py``:
  ResBlock           (ref :7-72) — spectral-norm 3x3 convs, nearest-2x
      upsampling in the decoder, 2x average-pool downsampling in the encoder,
      learned 1x1 shortcut when channel counts change.
  UNetDiscriminator  (ref :82-160) — channels [in,128,128,256,256,512,...],
      num_blocks = min(6, log2(max(H, W)) - 1), skip concats, three heads:
      per-pixel real/fake logit, per-pixel ``label_dim`` segmentation, and a
      global latent regressed from the bottleneck by a full-size conv.

TPU-first: NHWC layout, 3x3 convs via lax.conv_general_dilated (MXU),
spectral-norm power-iteration vectors in an explicit state pytree.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from threedhumangan_tpu.models.synthesis import spectral_normalize
from threedhumangan_tpu.utils.misc import kaiming_normal_leaky, uniform_init

_LRELU = lambda x: jnp.where(x >= 0, x, 0.2 * x)

CHANNELS = [128, 128, 256, 256, 512, 512, 512, 512]


def _init_conv(key, kh, kw, cin, cout, weight_scale=1.0):
    """HWIO conv params, kaiming-leaky init (ref kaiming_leaky_init :75-79,
    which covers Conv2d in this file) + torch-default bias."""
    kw_, kb = jax.random.split(key)
    fan_in = kh * kw * cin
    return {
        "w": kaiming_normal_leaky(kw_, (kh, kw, cin, cout), fan_in) * weight_scale,
        "b": uniform_init(kb, (cout,), 1.0 / math.sqrt(fan_in)),
    }


def _conv(p, x, stride=1, padding="SAME", w_override=None, compute_dtype=jnp.float32):
    # no preferred_element_type here: a widened (f32) output makes the conv
    # TRANSPOSE rule mix an f32 cotangent with bf16 weights, which
    # lax.conv_general_dilated rejects — the MXU still accumulates in f32
    # internally for bf16 inputs, only the stored output is bf16
    w = (p["w"] if w_override is None else w_override).astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(y.dtype)


def _sn_conv(p, sn_state, x, train, compute_dtype=jnp.float32):
    kh, kw, cin, cout = p["w"].shape
    w2d, new_sn = spectral_normalize(p["w"].reshape(-1, cout), sn_state, train)
    y = _conv(p, x, w_override=w2d.reshape(kh, kw, cin, cout), compute_dtype=compute_dtype)
    return y, new_sn


def _upsample2x(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _avgpool2(x):
    B, H, W, C = x.shape
    return jnp.mean(x.reshape(B, H // 2, 2, W // 2, 2, C), axis=(2, 4))


# ---------------------------------------------------------------------------
# ResBlock
# ---------------------------------------------------------------------------


def init_resblock(key, fin, fout, up_or_down, first=False):
    k1, k2, k3, s1, s2, s3 = jax.random.split(key, 6)
    params = {
        "conv1": _init_conv(k1, 3, 3, fin, fout),
        "conv2": _init_conv(k2, 3, 3, fout, fout),
    }
    state = {
        "conv1": {"u": _unit(s1, fout)},
        "conv2": {"u": _unit(s2, fout)},
    }
    if fin != fout:
        params["conv_s"] = _init_conv(k3, 1, 1, fin, fout)
        state["conv_s"] = {"u": _unit(s3, fout)}
    meta = {"up_or_down": up_or_down, "first": first, "learned_shortcut": fin != fout}
    return params, state, meta


def _unit(key, n):
    u = jax.random.normal(key, (n,))
    return u / (jnp.linalg.norm(u) + 1e-12)


def apply_resblock(params, state, meta, x, train, compute_dtype=jnp.float32):
    up_or_down = meta["up_or_down"]
    first = meta["first"]
    new_state = {}

    # shortcut (ref :57-72)
    xs = x
    if first:
        if up_or_down < 0:
            xs = _avgpool2(xs)
        if meta["learned_shortcut"]:
            xs, new_state["conv_s"] = _sn_conv(params["conv_s"], state["conv_s"], xs, train, compute_dtype)
    else:
        if up_or_down > 0:
            xs = _upsample2x(xs)
        if meta["learned_shortcut"]:
            xs, new_state["conv_s"] = _sn_conv(params["conv_s"], state["conv_s"], xs, train, compute_dtype)
        if up_or_down < 0:
            xs = _avgpool2(xs)

    # residual path (ref :47-55)
    dx = x
    if not first:
        dx = _LRELU(dx)
        if up_or_down > 0:
            dx = _upsample2x(dx)
    dx, new_state["conv1"] = _sn_conv(params["conv1"], state["conv1"], dx, train, compute_dtype)
    dx = _LRELU(dx)
    dx, new_state["conv2"] = _sn_conv(params["conv2"], state["conv2"], dx, train, compute_dtype)
    if up_or_down < 0:
        dx = _avgpool2(dx)

    return xs + dx, new_state


# ---------------------------------------------------------------------------
# UNetDiscriminator
# ---------------------------------------------------------------------------


def init_discriminator(key, meta: Dict) -> Tuple[Dict, Dict]:
    """(ref UNetDiscriminator.__init__ :84-122)"""
    semantic_dim = meta.get("semantic_dim", 0)
    label_dim = meta.get("label_dim", 0)
    latent_dim = meta["latent_dim"]
    output_dim = semantic_dim + label_dim

    num_blocks = meta.get("discriminator_blocks", 6)
    num_blocks = min(num_blocks, int(math.log2(max(meta["gen_height"], meta["gen_width"]))) - 1)

    input_channel = 6 if meta.get("dual_discrimination", False) else 3
    channels = [input_channel] + CHANNELS

    keys = jax.random.split(key, 2 * num_blocks + 4)
    ki = 0
    params: Dict = {"down": [], "up": []}
    state: Dict = {"down": [], "up": []}
    block_meta = {"down": [], "up": [], "num_blocks": num_blocks,
                  "semantic_dim": semantic_dim, "label_dim": label_dim,
                  "latent_dim": latent_dim, "output_dim": output_dim}

    for i in range(num_blocks):
        p, s, m = init_resblock(keys[ki], channels[i], channels[i + 1], -1, first=(i == 0))
        ki += 1
        params["down"].append(p)
        state["down"].append(s)
        block_meta["down"].append(m)

    p, s, m = init_resblock(keys[ki], channels[num_blocks], channels[num_blocks - 1], 1)
    ki += 1
    params["up"].append(p); state["up"].append(s); block_meta["up"].append(m)
    for i in range(1, num_blocks - 1):
        p, s, m = init_resblock(
            keys[ki], 2 * channels[num_blocks - i], channels[num_blocks - i - 1], 1)
        ki += 1
        params["up"].append(p); state["up"].append(s); block_meta["up"].append(m)
    p, s, m = init_resblock(keys[ki], 2 * channels[1], 64, 1)
    ki += 1
    params["up"].append(p); state["up"].append(s); block_meta["up"].append(m)
    del block_meta  # structure is re-derived from param shapes at apply time

    params["layer_up_last"] = _init_conv(keys[ki], 1, 1, 64, 1); ki += 1
    params["output_layer"] = _init_conv(keys[ki], 1, 1, 64, output_dim, weight_scale=0.25); ki += 1

    downsample = 2 ** num_blocks
    bh = meta["gen_height"] // downsample
    bw = meta["gen_width"] // downsample
    params["latent_layer"] = _init_conv(keys[ki], bh, bw, channels[num_blocks], latent_dim)

    return params, state


def discriminator_forward(
    params: Dict,
    state: Dict,
    images: jax.Array,
    conditions: Optional[Dict] = None,
    alpha: float = 1.0,
    train: bool = False,
    compute_dtype=jnp.float32,
    semantic_dim: int = 0,
    **_ignored,
) -> Tuple[Dict, Dict]:
    """(ref forward :125-160).  images: NHWC in [-1, 1].

    ``conditions``/``alpha`` accepted-but-unused for API parity (ref :125).
    Block structure (up/down, first, shortcut) is re-derived from param
    shapes at trace time — static config never rides the state pytree.
    Returns (dict with 'prediction' (B,H,W,1), 'segments' (B,H,W,label_dim),
    'latents' (B,latent_dim)), plus new spectral-norm state.
    """
    num_blocks = len(params["down"])
    latent_dim = params["latent_layer"]["w"].shape[-1]
    new_state = {"down": [], "up": []}

    def block_meta(p, up_or_down, first):
        return {"up_or_down": up_or_down, "first": first,
                "learned_shortcut": "conv_s" in p}

    x = images
    encoder_res = []
    for i in range(num_blocks):
        bm = block_meta(params["down"][i], -1, i == 0)
        x, s = apply_resblock(params["down"][i], state["down"][i], bm, x, train, compute_dtype)
        encoder_res.append(x)
        new_state["down"].append(s)

    if min(x.shape[1], x.shape[2]) > 1:
        latents = _conv(params["latent_layer"], x, padding="VALID", compute_dtype=compute_dtype)
        latents = latents.reshape(x.shape[0], latent_dim)
    else:
        latents = jnp.zeros((x.shape[0], latent_dim), x.dtype)

    bm = block_meta(params["up"][0], 1, False)
    x, s = apply_resblock(params["up"][0], state["up"][0], bm, x, train, compute_dtype)
    new_state["up"].append(s)
    for i in range(1, num_blocks):
        x = jnp.concatenate([encoder_res[-i - 1], x], axis=-1)
        bm = block_meta(params["up"][i], 1, False)
        x, s = apply_resblock(params["up"][i], state["up"][i], bm, x, train, compute_dtype)
        new_state["up"].append(s)

    prediction = _conv(params["layer_up_last"], x, compute_dtype=compute_dtype)
    heads = _conv(params["output_layer"], x, compute_dtype=compute_dtype)

    outputs = {
        "prediction": prediction,
        "latents": latents,
        "segments": heads[..., semantic_dim:],
    }
    if semantic_dim > 0:
        outputs["semantics"] = heads[..., :semantic_dim]
    return outputs, new_state
