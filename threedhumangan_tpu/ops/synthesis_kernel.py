"""Fused SPADE-synthesis Pallas kernel (inference path).

The XLA synthesis stack round-trips every intermediate activation through
HBM: at MAP3DBN512 shapes each (B, 512, 256, 420) tensor is ~0.9 GB in bf16
and a block touches half a dozen of them — measured ~235 ms per 8-image
batch on v5e, the largest pipeline stage after kernelizing the field.

This kernel runs the ENTIRE 9-block network per pixel tile:

  grid = (batch, row_tiles); each program:
    build the 2D coord grid for its rows from iota (no coords input at all)
    x = sin(coords @ W_in)                      # SynthesisInput, in VMEM
    for each block:                             # all weights resident in VMEM
      SPADE(x) -> lrelu -> 1x1 conv  (x2)       # per-pixel matmuls on MXU
      skip add, ToRGB accumulation
    write only the (TILE, 3) rgb tile

HBM traffic collapses to one read of the style map + one rgb write.
Inference-only simplifications folded on the host by ``fold_synthesis_params``:
  * spectral norm: sigma is computed once and divided into the conv weights
    (torch eval semantics — u is not updated);
  * batch norm (eval): running stats + affine fold into per-channel (a, b).

The XLA formulation (models/synthesis.py) remains the autodiff/training
path and the numerical reference for the equivalence test.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from threedhumangan_tpu.models.synthesis import spectral_normalize

_LRELU = lambda x: jnp.where(x >= 0, x, 0.2 * x)


def fold_synthesis_params(params: Dict, state: Dict, syn_input_params: Dict,
                          normalization: str = "batch_norm") -> Dict:
    """Flatten + fold the synthesis pytree for the kernel (host side, cheap)."""
    flat = {
        "in_w": syn_input_params["first"]["w"],
        "in_b": syn_input_params["first"]["b"][None],
    }
    for i, (bp, bs) in enumerate(zip(params["blocks"], state["blocks"])):
        for ci in (0, 1):
            w = bp[f"conv_{ci}"]["w"]
            w_bar, _ = spectral_normalize(w, bs[f"conv_{ci}"], train=False)
            flat[f"b{i}_conv{ci}_w"] = w_bar
            flat[f"b{i}_conv{ci}_b"] = bp[f"conv_{ci}"]["b"][None]
        for si in (0, 1):
            sp = bp[f"spade_{si}"]
            flat[f"b{i}_sp{si}_sh_w"] = sp["mlp_shared"]["w"]
            flat[f"b{i}_sp{si}_sh_b"] = sp["mlp_shared"]["b"][None]
            flat[f"b{i}_sp{si}_g_w"] = sp["mlp_gamma"]["w"]
            flat[f"b{i}_sp{si}_g_b"] = sp["mlp_gamma"]["b"][None]
            flat[f"b{i}_sp{si}_bt_w"] = sp["mlp_beta"]["w"]
            flat[f"b{i}_sp{si}_bt_b"] = sp["mlp_beta"]["b"][None]
            if normalization == "batch_norm":
                ns = bs[f"spade_{si}"]["norm"]
                a = sp["norm"]["scale"] * jax.lax.rsqrt(ns["var"] + 1e-5)
                b = sp["norm"]["bias"] - ns["mean"] * a
            elif normalization == "adaptive_batch_norm":
                ns = bs[f"spade_{si}"]["norm"]
                a = jax.lax.rsqrt(ns["var"] + 1e-5)
                b = -ns["mean"] * a
            else:  # instance/none handled outside the folded path
                a = jnp.ones((flat[f"b{i}_sp{si}_g_w"].shape[1],))
                b = jnp.zeros_like(a)
            flat[f"b{i}_sp{si}_norm_a"] = a[None]
            flat[f"b{i}_sp{si}_norm_b"] = b[None]
        flat[f"b{i}_rgb_w"] = params["to_rgbs"][i]["w"]
        flat[f"b{i}_rgb_b"] = params["to_rgbs"][i]["b"][None]
    return flat


def _synthesis_kernel(
    style_ref, fixed_ref, *rest_refs,
    weight_names, num_blocks, mod_blocks, map3d_mode, tile_rows, width,
    height, compute_dtype,
):
    weight_refs = rest_refs[: len(weight_names)]
    out_ref = rest_refs[len(weight_names)]
    W = {n: r[:] for n, r in zip(weight_names, weight_refs)}

    t = pl.program_id(1)
    P = tile_rows * width

    def mm(x, w):
        return jax.lax.dot_general(
            x.astype(compute_dtype), w.astype(compute_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    # 2D coord grid for this row tile (channels: row coord, col coord in
    # [-1, 1]; models/synthesis.get_2d_coords layout)
    rows = jax.lax.broadcasted_iota(jnp.float32, (tile_rows, width), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (tile_rows, width), 1)
    gi = ((t * tile_rows + rows) * (2.0 / (height - 1)) - 1.0).reshape(P, 1)
    gj = (cols * (2.0 / (width - 1)) - 1.0).reshape(P, 1)
    coords = jnp.concatenate([gi, gj], axis=-1)

    x = jnp.sin(mm(coords, W["in_w"]) + W["in_b"])
    x = x.astype(compute_dtype)

    style = style_ref[0].reshape(P, -1).astype(compute_dtype)
    fixed = fixed_ref[0].astype(compute_dtype)  # (1, F)

    rgb = None
    for i in range(num_blocks):
        if map3d_mode == "all":
            in_style = style + fixed
        elif map3d_mode == "mixed":
            in_style = (style + fixed) if i in mod_blocks else jnp.broadcast_to(fixed, style.shape)
        elif map3d_mode == "isolated":
            in_style = style if i in mod_blocks else jnp.broadcast_to(fixed, style.shape)
        else:
            raise ValueError(map3d_mode)

        x_orig = x
        for si in (0, 1):
            normed = x.astype(jnp.float32) * W[f"b{i}_sp{si}_norm_a"] + W[f"b{i}_sp{si}_norm_b"]
            actv = jnp.maximum(mm(in_style, W[f"b{i}_sp{si}_sh_w"]) + W[f"b{i}_sp{si}_sh_b"], 0.0)
            actv = actv.astype(compute_dtype)
            gamma = 1.0 + mm(actv, W[f"b{i}_sp{si}_g_w"]) + W[f"b{i}_sp{si}_g_b"]
            beta = mm(actv, W[f"b{i}_sp{si}_bt_w"]) + W[f"b{i}_sp{si}_bt_b"]
            x = _LRELU(normed * gamma + beta).astype(compute_dtype)
            x = (mm(x, W[f"b{i}_conv{si}_w"]) + W[f"b{i}_conv{si}_b"]).astype(compute_dtype)

        if i >= num_blocks // 2 and x.shape[-1] == x_orig.shape[-1]:
            x = x + x_orig

        if i >= num_blocks // 2 - 1:
            r = mm(x, W[f"b{i}_rgb_w"]) + W[f"b{i}_rgb_b"]
            rgb = r if rgb is None else rgb + r

    out_ref[0] = rgb.reshape(tile_rows, width, 3)


@functools.partial(
    jax.jit,
    static_argnames=("num_blocks", "mod_blocks", "map3d_mode", "tile_rows",
                     "compute_dtype", "interpret"),
)
def fused_synthesis(
    folded: Dict,
    style_map: jax.Array,   # (B, H, W, F) — the upsampled render features
    fixed_style: jax.Array,  # (B, 1, F)
    num_blocks: int,
    mod_blocks: Tuple[int, ...],
    map3d_mode: str,
    tile_rows: int = 16,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Returns rgb (B, H, W, 3) float32."""
    B, H, Wd, F = style_map.shape
    assert H % tile_rows == 0
    names = tuple(sorted(folded))
    weights = {
        n: (w.astype(compute_dtype) if n.endswith("_w") else w.astype(jnp.float32))
        for n, w in folded.items()
    }

    kernel = functools.partial(
        _synthesis_kernel,
        weight_names=names, num_blocks=num_blocks, mod_blocks=tuple(mod_blocks),
        map3d_mode=map3d_mode, tile_rows=tile_rows, width=Wd, height=H,
        compute_dtype=compute_dtype)

    grid = (B, H // tile_rows)
    in_specs = [
        pl.BlockSpec((1, tile_rows, Wd, F), lambda b, t: (b, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, F), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in names]
    out_specs = pl.BlockSpec((1, tile_rows, Wd, 3), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.VMEM)

    hidden = folded["b0_conv0_w"].shape[1]
    flops_px = num_blocks * 2 * 2 * (hidden * 128 + 128 * hidden * 2 + hidden * hidden)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((B, H, Wd, 3), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * H * Wd * flops_px,
            bytes_accessed=B * H * Wd * F * 2 + B * H * Wd * 3 * 4,
            transcendentals=B * H * Wd * hidden,
        ),
        interpret=interpret,
    )(style_map, fixed_style.reshape(B, 1, F), *[weights[n] for n in names])
