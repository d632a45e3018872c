import jax, jax.numpy as jnp, time
from threedhumangan_tpu.models.smpl import synthetic_smpl_model
from threedhumangan_tpu.ops.rasterize import rasterize_mesh_binned

B = 8
model = synthetic_smpl_model(num_verts=6890, num_faces=13776)
rng = jax.random.PRNGKey(0)
verts = jnp.asarray(model.v_template)[None].repeat(B, 0)
verts = verts + 0.005 * jax.random.normal(rng, verts.shape)
z = 3.0 + verts[..., 2]
vs = jnp.concatenate([verts[..., :2], z[..., None]], -1)
faces = jnp.asarray(model.faces, jnp.int32)

ref = None
for tile, K in [(32, 2048), (32, 512), (32, 256), (32, 128), (16, 128), (16, 256)]:
    fn = lambda v: rasterize_mesh_binned(v, faces, (512, 256), tile=tile, max_faces_per_tile=K)
    out = fn(vs); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5): out = fn(vs)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/5*1000
    p = out[0]
    if ref is None: ref = p
    mismatch = float((p != ref).mean())
    print(f"tile={tile} K={K}: {dt:.1f} ms  mismatch_vs_K2048={mismatch:.5f}")
