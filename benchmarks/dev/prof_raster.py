"""Rasterizer A/B: XLA binned vs Pallas tile kernel (true device times)."""
import sys, os
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from benchmarks.timing import device_time
from threedhumangan_tpu.models.smpl import synthetic_smpl_model
from threedhumangan_tpu.ops.rasterize import rasterize_mesh_binned, rasterize_mesh_pallas

B = int(os.environ.get("BENCH_BATCH", "8"))
H, W = 512, 256
smpl = synthetic_smpl_model(num_verts=6890, num_faces=13776)
rng = jax.random.PRNGKey(0)
verts = jnp.asarray(smpl.v_template)[None].repeat(B, 0)
verts = verts + 0.01 * jax.random.normal(rng, verts.shape)
z = 2.0 + 0.3 * (verts[..., 2] - verts[..., 2].min())
vs0 = jnp.concatenate([verts[..., :2], z[..., None]], axis=-1)
faces = jnp.asarray(smpl.faces, jnp.int32)

def tick(x):
    return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree_util.tree_leaves(x)) * 1e-30

for K in (512, 640, 1024):
    def step_xla(i, carry, K=K):
        p, b, zb = rasterize_mesh_binned(vs0 + carry, faces, (H, W), tile=32,
                                         max_faces_per_tile=K)
        return tick((p.astype(jnp.float32), b, zb))
    def step_pal(i, carry, K=K):
        p, b, zb = rasterize_mesh_pallas(vs0 + carry, faces, (H, W), tile=32,
                                         max_faces_per_tile=K)
        return tick((p.astype(jnp.float32), b, zb))
    for name, fn in (("xla", step_xla), ("pallas", step_pal)):
        per, _ = device_time(fn, n1=2, n2=8)
        print(f"K={K:5d} {name:7s}: {per*1000:7.1f} ms/batch{B}")
