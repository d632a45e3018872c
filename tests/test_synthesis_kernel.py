"""Fused synthesis kernel vs the XLA stack (interpret mode, eval semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threedhumangan_tpu.models import synthesis as syn
from threedhumangan_tpu.ops.synthesis_kernel import fold_synthesis_params, fused_synthesis


@pytest.mark.parametrize("mode", ["mixed", "isolated", "all"])
def test_fused_synthesis_matches_xla(rng, mode):
    B, H, W, F = 1, 8, 8, 16
    NB = 4
    params, state, meta = syn.init_synthesis_network(
        rng, input_dim=F, style_dim=F, hidden_dim=F, num_blocks=NB,
        mod_blocks=(0, 1), spatial_normalization="batch_norm", map3d_mode=mode)
    k1, k2, k3 = jax.random.split(rng, 3)
    syn_input = syn.init_synthesis_input(k1, 2, F)
    style = jax.random.normal(k2, (B, H, W, F))
    fixed = jax.random.normal(k3, (B, 1, F))

    # make the running stats non-trivial
    for b in state["blocks"]:
        for s in ("spade_0", "spade_1"):
            b[s]["norm"]["mean"] = 0.1 * jnp.arange(b[s]["norm"]["mean"].shape[0], dtype=jnp.float32)
            b[s]["norm"]["var"] = 1.0 + 0.05 * jnp.arange(b[s]["norm"]["var"].shape[0], dtype=jnp.float32)

    # XLA reference (eval mode)
    coords = syn.get_2d_coords(B, H, W)
    x0 = syn.apply_synthesis_input(syn_input, coords)
    ref, _ = syn.apply_synthesis_network(params, state, meta, x0, style, fixed, train=False)

    folded = fold_synthesis_params(params, state, syn_input, "batch_norm")
    out = fused_synthesis(
        folded, style, fixed, num_blocks=NB, mod_blocks=(0, 1), map3d_mode=mode,
        tile_rows=4, compute_dtype=jnp.float32, interpret=True)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref["final"]), rtol=5e-3, atol=5e-4)
