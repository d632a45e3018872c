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

# leaky relu as min/max algebra: bf16 vector comparisons (jnp.where) do not
# lower on all Mosaic targets, min/max always do
_LRELU = lambda x: jnp.maximum(x, 0) + 0.2 * jnp.minimum(x, 0)


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
            if normalization == "batch_norm":
                ns = bs[f"spade_{si}"]["norm"]
                a = sp["norm"]["scale"] * jax.lax.rsqrt(ns["var"] + 1e-5)
                b = sp["norm"]["bias"] - ns["mean"] * a
            elif normalization == "adaptive_batch_norm":
                ns = bs[f"spade_{si}"]["norm"]
                a = jax.lax.rsqrt(ns["var"] + 1e-5)
                b = -ns["mean"] * a
            else:  # instance/none handled outside the folded path
                a = jnp.ones((sp["mlp_gamma"]["w"].shape[1],))
                b = jnp.zeros_like(a)
            # fold the norm affine (a, b) INTO the gamma/beta MLP weights:
            #   a*(x_norm)*gamma + ... == x * gamma' + beta'  with
            #   gamma' = actv@(g_w*a) + a*(1+g_b)
            #   beta'  = actv@(g_w*b + bt_w) + b*(1+g_b) + bt_b
            # so the kernel applies ONE fma per element instead of the
            # norm pass + (1+gamma) modulate (the synthesis kernel is
            # partially VPU-bound; ref map3d_layers.py:153-190 semantics)
            g_w, g_b = sp["mlp_gamma"]["w"], sp["mlp_gamma"]["b"][None]
            bt_w, bt_b = sp["mlp_beta"]["w"], sp["mlp_beta"]["b"][None]
            flat[f"b{i}_sp{si}_g_w"] = g_w * a[None]
            flat[f"b{i}_sp{si}_g_b"] = (1.0 + g_b) * a[None]
            flat[f"b{i}_sp{si}_bt_w"] = g_w * b[None] + bt_w
            flat[f"b{i}_sp{si}_bt_b"] = (1.0 + g_b) * b[None] + bt_b
        flat[f"b{i}_rgb_w"] = params["to_rgbs"][i]["w"]
        flat[f"b{i}_rgb_b"] = params["to_rgbs"][i]["b"][None]
    return flat


def _synthesis_kernel(
    *refs,
    weight_names, num_blocks, block_start, block_end, mod_blocks, map3d_mode,
    tile_rows, width, height, compute_dtype, has_x_in, rank1_rows,
    has_style=True, has_gab=True,
):
    """One fused stage covering blocks [block_start, block_end).

    The whole 9-block network at width 420 plus double-buffered inputs
    exceeds the 16 MB VMEM budget, so the network runs as ceil(NB/5)
    stages; (x, rgb) round-trip HBM once per stage boundary — still ~15x
    less traffic than the per-op XLA formulation.

    ``rank1_rows`` maps blocks whose style input is the FIXED (per-image)
    vector to row offsets in the precomputed ``gab`` table: for those
    blocks the whole SPADE MLP collapses to per-channel (ga, gb) rows
    (isolated/mixed modes run 6 of 9 blocks this way in the shipped
    configs — computing the MLP per pixel on broadcast rows wasted ~1/3
    of the kernel's FLOPs).
    """
    idx0 = 0
    if has_style:
        style_ref = refs[idx0]; idx0 += 1
        fixed_ref = refs[idx0]; idx0 += 1
    if has_gab:
        gab_ref = refs[idx0]; idx0 += 1
    if has_x_in:
        x_in_ref = refs[idx0]; idx0 += 1
        rgb_in_ref = refs[idx0]; idx0 += 1
    weight_refs = refs[idx0 : idx0 + len(weight_names)]
    x_out_ref, rgb_out_ref = refs[idx0 + len(weight_names) :]
    W = {n: r[:] for n, r in zip(weight_names, weight_refs)}

    t = pl.program_id(1)
    P = tile_rows * width

    def mm(x, w):
        return jax.lax.dot_general(
            x.astype(compute_dtype), w.astype(compute_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    if has_x_in:
        x = x_in_ref[0].reshape(P, -1).astype(compute_dtype)
        rgb = rgb_in_ref[0].reshape(P, -1).astype(jnp.float32)
    else:
        # 2D coord grid for this row tile (channels: row coord, col coord in
        # [-1, 1]; models/synthesis.get_2d_coords layout) — built directly in
        # (P, 1) layout (a (tile, W) -> (P, 1) reshape is an unsupported
        # minor-dim cast in Mosaic)
        idx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        rows = (idx // width).astype(jnp.float32)
        cols = (idx % width).astype(jnp.float32)
        gi = (t * tile_rows + rows) * (2.0 / (height - 1)) - 1.0
        gj = cols * (2.0 / (width - 1)) - 1.0
        coords = jnp.concatenate([gi, gj], axis=-1)
        x = jnp.sin(mm(coords, W["in_w"]) + W["in_b"])
        x = x.astype(compute_dtype)
        rgb = None

    if has_style:
        style = style_ref[0].reshape(P, -1).astype(compute_dtype)
        fixed = fixed_ref[0].astype(compute_dtype)  # (1, F)

    for i in range(block_start, block_end):
        rank1 = i in rank1_rows
        if rank1:
            in_style = None
        elif map3d_mode == "all":
            in_style = style + fixed
        elif map3d_mode == "mixed":
            in_style = style + fixed
        elif map3d_mode == "isolated":
            in_style = style
        else:
            raise ValueError(map3d_mode)

        x_orig = x
        for si in (0, 1):
            # keep all (P, C) temporaries in compute dtype — the Mosaic
            # stack allocator does not reuse buffers across the unrolled
            # block iterations, so f32 temporaries overflow VMEM
            cd = compute_dtype
            if rank1:
                # fixed-style block: norm affine + SPADE gamma/beta fold
                # into two per-channel rows (precomputed outside)
                row = rank1_rows[i] + 2 * si
                ga = gab_ref[0, row : row + 1, :].astype(cd)
                gb = gab_ref[0, row + 1 : row + 2, :].astype(cd)
                x = _LRELU(x * ga + gb).astype(cd)
            else:
                # norm affine pre-folded into the gamma/beta weights
                # (fold_synthesis_params): one fma per element
                actv = jnp.maximum(
                    mm(in_style, W[f"b{i}_sp{si}_sh_w"]) + W[f"b{i}_sp{si}_sh_b"], 0.0
                ).astype(cd)
                gamma = (mm(actv, W[f"b{i}_sp{si}_g_w"]) + W[f"b{i}_sp{si}_g_b"]).astype(cd)
                beta = (mm(actv, W[f"b{i}_sp{si}_bt_w"]) + W[f"b{i}_sp{si}_bt_b"]).astype(cd)
                x = _LRELU(x * gamma + beta).astype(cd)
            x = (mm(x, W[f"b{i}_conv{si}_w"]) + W[f"b{i}_conv{si}_b"]).astype(cd)

        if i >= num_blocks // 2 and x.shape[-1] == x_orig.shape[-1]:
            x = x + x_orig

        if i >= num_blocks // 2 - 1:
            r = mm(x, W[f"b{i}_rgb_w"]) + W[f"b{i}_rgb_b"]
            rgb = r if rgb is None else rgb + r

    x_out_ref[0] = x.reshape(tile_rows, width, -1).astype(x_out_ref.dtype)
    if rgb is None:
        rgb = jnp.zeros((P, 3), jnp.float32)
    rgb_out_ref[0] = rgb.reshape(tile_rows, width, 3)


def auto_synth_stages(num_blocks, hidden, style_dim, tile_rows, width,
                      rank1_blocks, budget=int(15 * 2 ** 20)):
    """Largest blocks_per_stage whose worst stage fits the scoped-VMEM
    budget: resident stage weights + double-buffered style/x tiles + the
    per-pixel activation working set.  Fewer stages = fewer (B, H, W,
    hidden) bf16 HBM round-trips at the stage boundaries (the kernel's
    measured remaining gap).  Calibrated on v5e at 512x256 width 420:
    tile_rows 2 runs all 9 blocks in one stage; tile_rows 4 needs 4-block
    stages."""
    P = tile_rows * width

    def stage_cost(start, end):
        wbytes = 0
        for i in range(start, end):
            wbytes += 2 * hidden * hidden * 2 + hidden * 3 * 2  # convs+rgb
            if i not in rank1_blocks:
                wbytes += (style_dim * 128 + 2 * 128 * hidden) * 2 * 2
        has_style = any(i not in rank1_blocks for i in range(start, end))
        tiles = 4 * P * hidden * 2  # x in/out, double-buffered
        if has_style:
            tiles += 2 * P * style_dim * 2
        act = P * hidden * 2 * 4  # ~2 live f32 (P, hidden) temporaries
        return wbytes + tiles + act

    for bps in range(num_blocks, 0, -1):
        if all(stage_cost(s, min(s + bps, num_blocks)) <= budget
               for s in range(0, num_blocks, bps)):
            return bps
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("num_blocks", "mod_blocks", "map3d_mode", "tile_rows",
                     "compute_dtype", "interpret", "blocks_per_stage"),
)
def fused_synthesis(
    folded: Dict,
    style_map: jax.Array,   # (B, H, W, F) — the upsampled render features
    fixed_style: jax.Array,  # (B, 1, F)
    num_blocks: int,
    mod_blocks: Tuple[int, ...],
    map3d_mode: str,
    tile_rows: int = 2,  # swept on v5e at 512x256x420: {1: 35.1, 2: 37.0,
                         # 4: 35.6} imgs/sec/chip end-to-end; 8 OOMs VMEM
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    blocks_per_stage: int | None = None,
) -> jax.Array:
    """Returns rgb (B, H, W, 3) float32.

    Runs the network in ceil(num_blocks / blocks_per_stage) fused stages so
    each stage's weights fit the 16 MB VMEM budget at width 420.
    ``blocks_per_stage=None`` picks the largest stage the VMEM model says
    fits (`auto_synth_stages`).
    """
    B, H, Wd, F = style_map.shape
    assert H % tile_rows == 0
    hidden = folded["b0_conv0_w"].shape[1]
    if blocks_per_stage is None:
        _rank1 = ([] if map3d_mode == "all" else
                  [i for i in range(num_blocks) if i not in mod_blocks])
        blocks_per_stage = auto_synth_stages(
            num_blocks, hidden, F, tile_rows, Wd, _rank1)

    cast = lambda d: {
        n: (w.astype(compute_dtype) if n.endswith("_w") else w.astype(jnp.float32))
        for n, w in d.items()
    }

    # Blocks whose style input is the per-image FIXED vector (isolated /
    # mixed non-mod blocks): their SPADE MLP output is rank-1 over pixels,
    # so gamma/beta collapse to per-channel rows computed here (XLA, a few
    # (B, 128) matmuls) instead of per-pixel in the kernel — at the shipped
    # mod_blocks=(0,1,2) of 9 this removes ~1/3 of the kernel's FLOPs and
    # the rank-1 blocks' MLP weights from VMEM.
    rank1_blocks = ([] if map3d_mode == "all" else
                    [i for i in range(num_blocks) if i not in mod_blocks])
    rank1_rows = {i: 4 * k for k, i in enumerate(rank1_blocks)}
    gab = None
    if rank1_blocks:
        fx = fixed_style.reshape(B, -1).astype(compute_dtype)
        rows = []
        for i in rank1_blocks:
            for si in (0, 1):
                # the norm affine is pre-folded into g/bt, so these ARE
                # the (ga, gb) rows of x -> lrelu(x*ga + gb) directly
                actv = jnp.maximum(
                    fx @ folded[f"b{i}_sp{si}_sh_w"].astype(compute_dtype)
                    + folded[f"b{i}_sp{si}_sh_b"], 0.0).astype(compute_dtype)
                rows.append(actv @ folded[f"b{i}_sp{si}_g_w"].astype(compute_dtype)
                            + folded[f"b{i}_sp{si}_g_b"])
                rows.append(actv @ folded[f"b{i}_sp{si}_bt_w"].astype(compute_dtype)
                            + folded[f"b{i}_sp{si}_bt_b"])
        gab = jnp.stack(rows, axis=1).astype(jnp.float32)  # (B, n_rows, hidden)

    grid = (B, H // tile_rows)
    style_specs = [
        pl.BlockSpec((1, tile_rows, Wd, F), lambda b, t: (b, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, F), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    gab_spec = None
    if gab is not None:
        gab_spec = pl.BlockSpec((1, gab.shape[1], hidden), lambda b, t: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, tile_rows, Wd, hidden), lambda b, t: (b, t, 0, 0),
                          memory_space=pltpu.VMEM)
    rgb_spec = pl.BlockSpec((1, tile_rows, Wd, 3), lambda b, t: (b, t, 0, 0),
                            memory_space=pltpu.VMEM)

    fixed_style = fixed_style.reshape(B, 1, F)
    x = None
    rgb = None

    for start in range(0, num_blocks, blocks_per_stage):
        end = min(start + blocks_per_stage, num_blocks)

        def _needed(n):
            if n.startswith("in_"):
                return start == 0
            blk = int(n[1:].split("_", 1)[0])
            if not (start <= blk < end):
                return False
            # rank-1 blocks read only their conv + rgb weights
            if blk in rank1_rows and ("_sp" in n):
                return False
            return True

        stage = {n: w for n, w in folded.items() if _needed(n)}
        stage = cast(stage)
        names = tuple(sorted(stage))
        has_x_in = start > 0
        # skip the (1, tile, W, F) style read for stages whose blocks are
        # all rank-1 (isolated mode runs 6 of 9 blocks that way): the big
        # style map is only streamed through stages that modulate with it
        has_style = any(i not in rank1_rows for i in range(start, end))
        has_gab = gab is not None and any(
            i in rank1_rows for i in range(start, end))

        kernel = functools.partial(
            _synthesis_kernel,
            weight_names=names, num_blocks=num_blocks,
            block_start=start, block_end=end,
            mod_blocks=tuple(mod_blocks), map3d_mode=map3d_mode,
            tile_rows=tile_rows, width=Wd, height=H,
            compute_dtype=compute_dtype, has_x_in=has_x_in,
            rank1_rows=rank1_rows, has_style=has_style, has_gab=has_gab)

        in_specs = []
        args = []
        if has_style:
            in_specs += style_specs
            args += [style_map, fixed_style]
        if has_gab:
            in_specs.append(gab_spec)
            args.append(gab)
        if has_x_in:
            in_specs += [x_spec, rgb_spec]
            args += [x, rgb]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in names]
        args += [stage[n] for n in names]

        n_mod = sum(1 for i in range(start, end) if i not in rank1_rows)
        n_stage = end - start
        flops_px = (n_stage * 2 * 2 * hidden * hidden
                    + n_mod * 2 * 2 * (hidden * 128 + 128 * hidden * 2))
        x, rgb = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[x_spec, rgb_spec],
            out_shape=[
                # stage-boundary activations stay in compute dtype (bf16):
                # they round-trip HBM once per stage
                jax.ShapeDtypeStruct((B, H, Wd, hidden), compute_dtype),
                jax.ShapeDtypeStruct((B, H, Wd, 3), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=B * H * Wd * flops_px,
                bytes_accessed=B * H * Wd * (F + hidden) * 2,
                transcendentals=B * H * Wd * (hidden if start == 0 else 0),
            ),
            interpret=interpret,
        )(*args)

    return rgb
