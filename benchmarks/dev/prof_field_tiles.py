"""Field kernel: tile_rays x march_loop sweep (true device times)."""
import sys, os
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from benchmarks.timing import device_time
from threedhumangan_tpu.models.siren import init_coordconcat_siren
from threedhumangan_tpu.ops.raymarch import fused_field_render, pack_field_inputs

B = int(os.environ.get("BENCH_BATCH", "8"))
H, G, F, NB = 420, 31, 384, 4
S = 32
R = 48 * 96          # MAP3DBN512 rays
P = R * S
rng = jax.random.PRNGKey(0)
ks = jax.random.split(rng, 6)
params = init_coordconcat_siren(ks[0], 3, H, G, F, NB)
pts = jax.random.normal(ks[1], (B, P, 3))
geo = 0.3 * jax.random.normal(ks[2], (B, P, G))
dirs = jax.random.normal(ks[3], (B, P, 3))
freq = 0.1 * jax.random.normal(ks[4], (B, NB * H))
phase = 0.1 * jax.random.normal(ks[5], (B, NB * H))
zv = jnp.broadcast_to(jnp.linspace(1.0, 2.0, S), (B, R, S))
packed = pack_field_inputs(pts, geo, dirs, 2.0 / 2.85)

def tick(x):
    return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree_util.tree_leaves(x)) * 1e-30

for tile, loop in [(64, False), (64, True), (128, True), (256, True)]:
    def step(i, carry, tile=tile, loop=loop):
        out, d = fused_field_render(params, packed + carry * 1e-30, freq, phase, zv,
                                    num_steps=S, tile_rays=tile, march_loop=loop,
                                    compute_dtype=jnp.bfloat16)
        return tick((out, d))
    try:
        per, _ = device_time(step, n1=2, n2=8)
        print(f"tile={tile:4d} loop={int(loop)}: {per*1000:7.1f} ms/batch{B}", flush=True)
    except Exception as e:
        print(f"tile={tile:4d} loop={int(loop)}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
