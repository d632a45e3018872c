"""Empirical check of the 420-lane-padding ceiling claim (VERDICT r4 #7).

PERFORMANCE.md argues the synthesis kernel's 71% roofline attainment is the
MXU lane-padding ceiling of the model's 420-channel width: Mosaic pads
(P,420)x(420,420) matmuls to (P,512)x(512,512), so max attainable vs the
true-FLOP roofline is (420/512)^2 = 67% on convs, ~70% blended with the
exactly-fitting (.,128) SPADE MLP matmuls.  If that story is right, the SAME
kernel at width 512 (a non-parity config) must attain ~95%+ of its own
roofline.  This script times fused_synthesis at width 420 and width 512 and
prints % attained for both.

Usage: python benchmarks/dev/prof_synth_width.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from benchmarks.timing import device_time
from threedhumangan_tpu import configs
from threedhumangan_tpu.models.generator import init_generator
from threedhumangan_tpu.models.mapping import apply_two_part_mapping_network
from threedhumangan_tpu.ops.synthesis_kernel import (
    fold_synthesis_params,
    fused_synthesis,
)

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
MXU = 197e12


def run_width(width: int):
    meta = dict(configs.extract_metadata(configs.MAP3DBN512L, 0))
    meta.update(dataset_length=BATCH, hidden_dim=width, feature_dim=width,
                latent_dim=width)
    rng = jax.random.PRNGKey(0)
    print(f"[width {width}] init...", flush=True)
    params, state = jax.jit(init_generator, static_argnames=("meta_key",))(
        rng, meta) if False else init_generator(rng, meta)
    B, GH, GW = BATCH, meta["gen_height"], meta["gen_width"]
    H, F = meta["hidden_dim"], meta["feature_dim"]

    print(f"[width {width}] prep...", flush=True)
    z0 = jax.random.normal(rng, (B, meta["latent_dim"]))

    @jax.jit
    def prep(params, state, z0, key):
        _, styles = apply_two_part_mapping_network(
            params["synthesis_mapping_network"], z0)
        up = jax.random.normal(key, (B, GH, GW, F), jnp.bfloat16)
        folded = fold_synthesis_params(
            params["synthesis_network"], state["synthesis_network"],
            params["synthesis_input"], meta["spatial_normalization"])
        return styles, up, folded

    styles, up, folded = prep(params, state, z0, rng)
    print(f"[width {width}] timing...", flush=True)

    def st(i, c, folded, up, styles):
        r = fused_synthesis(
            folded, up + c, styles, num_blocks=meta["synthesis_blocks"],
            mod_blocks=tuple(meta["mod_blocks"]),
            map3d_mode=meta.get("map3d_mode", "isolated"),
            compute_dtype=jnp.bfloat16)
        return sum(jnp.sum(v.astype(jnp.float32))
                   for v in jax.tree_util.tree_leaves(r)) * 1e-30

    per, _ = device_time(st, n1=2, n2=8, args=(folded, up, styles))
    synth_flops = B * GH * GW * 9 * 2 * (2 * (H * 128 + 128 * H * 2 + H * H))
    bound = synth_flops / MXU
    print(f"width {width}: {per*1e3:7.2f} ms/batch  roofline {bound*1e3:6.2f} ms"
          f"  -> {bound/per*100:5.1f}% attained", flush=True)
    return per, bound


if __name__ == "__main__":
    run_width(420)
    run_width(512)
