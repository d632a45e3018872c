import sys, jax, jax.numpy as jnp, numpy as np, time
from threedhumangan_tpu.models import synthesis as syn
from threedhumangan_tpu.ops.synthesis_kernel import fold_synthesis_params, fused_synthesis

tile = int(sys.argv[1]) if len(sys.argv) > 1 else 8
B, H, W, F = 8, 512, 256, 420
NB = 9
rng = jax.random.PRNGKey(0)
params, state, meta = syn.init_synthesis_network(
    rng, input_dim=F, style_dim=F, hidden_dim=F, num_blocks=NB,
    mod_blocks=(0,1,2), spatial_normalization="batch_norm", map3d_mode="isolated")
syn_input = syn.init_synthesis_input(rng, 2, F)
style = jax.random.normal(rng, (B, H, W, F), jnp.bfloat16)
fixed = jax.random.normal(rng, (B, 1, F))
folded = fold_synthesis_params(params, state, syn_input, "batch_norm")
fn = lambda: fused_synthesis(folded, style, fixed, num_blocks=NB, mod_blocks=(0,1,2),
                             map3d_mode="isolated", tile_rows=tile, compute_dtype=jnp.bfloat16)
out = fn(); jax.block_until_ready(out)
print("ok", out.shape)
t0 = time.perf_counter()
for _ in range(5): out = fn()
jax.block_until_ready(out)
print(f"tile={tile}: {(time.perf_counter()-t0)/5*1000:.1f} ms")
