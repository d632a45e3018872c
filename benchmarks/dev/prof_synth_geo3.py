"""Synthesis/geo device times — params passed as jit ARGS (closing over
concrete arrays embeds them as constants and makes the while-loop compile
pathological)."""
import sys, os, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp

B = int(os.environ.get("BENCH_BATCH", "8"))
from threedhumangan_tpu import configs
meta = dict(configs.extract_metadata(configs.MAP3DBN512L, 0))
meta["dataset_length"] = B
from threedhumangan_tpu.models.generator import init_generator
from threedhumangan_tpu.ops.synthesis_kernel import fold_synthesis_params, fused_synthesis
from threedhumangan_tpu.models.mapping import apply_two_part_mapping_network
from threedhumangan_tpu.models.smpl import synthetic_smpl_model, get_geo_features

rng = jax.random.PRNGKey(0)

@jax.jit
def setup(key):
    params, state = init_generator(key, meta)
    folded = fold_synthesis_params(params["synthesis_network"], state["synthesis_network"],
                                   params["synthesis_input"], meta["spatial_normalization"])
    z0 = jax.random.normal(key, (B, meta["latent_dim"]))
    _, styles0 = apply_two_part_mapping_network(params["synthesis_mapping_network"], z0)
    fm0 = jax.random.normal(key, (B, meta["gen_height"], meta["gen_width"], meta["feature_dim"]))
    return folded, styles0, fm0

folded, styles0, fm0 = setup(rng)
print("setup done", flush=True)

def tick(x):
    return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree_util.tree_leaves(x)) * 1e-30

@jax.jit
def run_syn(n, folded, fm0, styles0):
    def body(i, carry):
        rgbs = fused_synthesis(folded, fm0 + carry, styles0,
                               num_blocks=meta["synthesis_blocks"],
                               mod_blocks=tuple(meta["mod_blocks"]),
                               map3d_mode=meta.get("map3d_mode", "isolated"),
                               tile_rows=2, compute_dtype=jnp.bfloat16)
        return tick(rgbs)
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

float(run_syn(1, folded, fm0, styles0))
def timed(n):
    t0 = time.perf_counter(); float(run_syn(n, folded, fm0, styles0)); return time.perf_counter()-t0
t1 = timed(2); t2 = timed(8)
print(f"synthesis kernel: {(t2-t1)/6*1000:7.1f} ms/batch{B}", flush=True)

smpl = synthetic_smpl_model(num_verts=6890, num_faces=13776)
n_pts = meta["render_width"] * meta["render_height"] * meta["num_steps"]
@jax.jit
def geo_setup(key):
    ks = jax.random.split(key, 3)
    return (jax.random.normal(ks[0], (B, n_pts, 3)),
            jnp.asarray(smpl.v_template)[None].repeat(B, 0),
            jax.random.normal(ks[1], (B, smpl.num_joints, 3)),
            jnp.tile(jnp.eye(4), (B, smpl.num_joints, 1, 1)),
            jax.nn.softmax(jax.random.normal(ks[2], (B, 6890, smpl.num_joints)), -1))
pts0, verts, skel, fk, lbs = geo_setup(rng)

@jax.jit
def run_geo(n, pts0, verts, skel, fk, lbs):
    def body(i, carry):
        g = get_geo_features(pts0 + carry, skel, verts, verts * 0.9, fk, lbs,
                             use_pallas_knn=True)
        return tick(g)
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
float(run_geo(1, pts0, verts, skel, fk, lbs))
def timed2(n):
    t0 = time.perf_counter(); float(run_geo(n, pts0, verts, skel, fk, lbs)); return time.perf_counter()-t0
t1 = timed2(2); t2 = timed2(8)
print(f"geo features    : {(t2-t1)/6*1000:7.1f} ms/batch{B}", flush=True)
