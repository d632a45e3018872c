"""Synthesis-kernel-only and geo-only true device times + raster standalone."""
import sys, os, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from benchmarks.timing import device_time

B = int(os.environ.get("BENCH_BATCH", "8"))
rng = jax.random.PRNGKey(0)

def tick(x):
    return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree_util.tree_leaves(x)) * 1e-30

# ---- synthesis kernel only (MAP3DBN512L shapes) ----
from threedhumangan_tpu import configs
meta = dict(configs.extract_metadata(configs.MAP3DBN512L, 0))
meta["dataset_length"] = B
from threedhumangan_tpu.models.generator import init_generator
from threedhumangan_tpu.ops.synthesis_kernel import fold_synthesis_params, fused_synthesis
params, state = init_generator(rng, meta)
folded = fold_synthesis_params(params["synthesis_network"], state["synthesis_network"],
                               params["synthesis_input"], meta["spatial_normalization"])
fm0 = jax.random.normal(rng, (B, meta["gen_height"], meta["gen_width"], meta["feature_dim"]), jnp.float32)
from threedhumangan_tpu.models.mapping import apply_two_part_mapping_network
z0 = jax.random.normal(rng, (B, meta["latent_dim"]))
_, styles0 = apply_two_part_mapping_network(params["synthesis_mapping_network"], z0)

def step_syn(i, carry):
    rgbs = fused_synthesis(folded, fm0 + carry, styles0,
                           num_blocks=meta["synthesis_blocks"],
                           mod_blocks=tuple(meta["mod_blocks"]),
                           map3d_mode=meta.get("map3d_mode", "isolated"),
                           tile_rows=meta.get("pallas_synthesis_tile_rows", 4),
                           compute_dtype=jnp.bfloat16)
    return tick(rgbs)
per, _ = device_time(step_syn, n1=2, n2=8)
print(f"synthesis kernel: {per*1000:7.1f} ms/batch{B}", flush=True)

# ---- geo features only ----
from threedhumangan_tpu.models.smpl import synthetic_smpl_model, get_geo_features
smpl = synthetic_smpl_model(num_verts=6890, num_faces=13776)
n_pts = meta["render_width"] * meta["render_height"] * meta["num_steps"]
ks = jax.random.split(rng, 4)
pts0 = jax.random.normal(ks[0], (B, n_pts, 3))
verts = jnp.asarray(smpl.v_template)[None].repeat(B, 0)
tpose = verts * 0.9
skel = jax.random.normal(ks[1], (B, smpl.num_joints, 3))
fk = jnp.tile(jnp.eye(4), (B, smpl.num_joints, 1, 1))
lbs = jax.nn.softmax(jax.random.normal(ks[2], (B, 6890, smpl.num_joints)), -1)

def step_geo(i, carry):
    g = get_geo_features(pts0 + carry, skel, verts, tpose, fk, lbs,
                         use_pallas_knn=True)
    return tick(g)
per, _ = device_time(step_geo, n1=2, n2=8)
print(f"geo features    : {per*1000:7.1f} ms/batch{B}", flush=True)

# ---- Pallas rasterizer standalone (no while harness; chained dispatch) ----
from threedhumangan_tpu.ops.rasterize import rasterize_mesh_pallas, rasterize_mesh_binned
vz = 2.0 + 0.3 * (verts[..., 2] - verts[..., 2].min())
vs0 = jnp.concatenate([verts[..., :2], vz[..., None]], axis=-1)
faces = jnp.asarray(smpl.faces, jnp.int32)
for name, fn in (("pallas", rasterize_mesh_pallas), ("xla", rasterize_mesh_binned)):
    try:
        f = jax.jit(lambda v, fn=fn: fn(v, faces, (512, 256), tile=32,
                                        max_faces_per_tile=640))
        p, b, zb = f(vs0)
        s = float(jnp.sum(b) + jnp.sum(zb * 0))  # materialize
        t0 = time.perf_counter()
        carry = 0.0
        for i in range(10):
            p, b, zb = f(vs0 + carry * 1e-30)
            carry = float(jnp.sum(b))  # per-iter materialization (serializes)
        dt = (time.perf_counter() - t0) / 10
        print(f"raster {name:6s} K=640: {dt*1000:7.1f} ms/batch{B} (incl ~29ms rpc)", flush=True)
    except Exception as e:
        print(f"raster {name:6s} K=640: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
