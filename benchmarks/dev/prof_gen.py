"""Generator sub-stage device times (true, via fori_loop harness)."""
import sys, os
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from benchmarks.timing import device_time

from threedhumangan_tpu import configs
from threedhumangan_tpu.data.dataset import SyntheticSHHQDataset, iterate_batches
from threedhumangan_tpu.data.preprocessor import get_preprocessor
from threedhumangan_tpu.models.generator import init_generator, render
from threedhumangan_tpu.models.mapping import apply_mapping_network, apply_two_part_mapping_network
from threedhumangan_tpu.models.smpl import synthetic_smpl_model, get_geo_features
from threedhumangan_tpu.ops.raymarch import fused_field_render, pack_field_inputs
from threedhumangan_tpu.models import volume_rendering as vr

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
TILE = int(os.environ.get("TILE_RAYS", "64"))
meta = dict(configs.extract_metadata(configs.MAP3DBN512L, 0))
meta.update(dataset_length=BATCH, nerf_noise=0.0, perturb_rays=False,
            pallas_field=True, pallas_knn=True, pallas_synthesis=True,
            pallas_tile_rays=TILE, raster_faces_per_tile=512)

smpl = synthetic_smpl_model(num_verts=6890, num_faces=13776)
ds = SyntheticSHHQDataset(smpl_model=smpl, **meta)
pre = get_preprocessor(meta, smpl_model=smpl)
batch = next(iterate_batches(ds, BATCH, shuffle=False))
batch = {k: jnp.asarray(v) for k, v in batch.items()}
rng = jax.random.PRNGKey(0)
params, state = init_generator(rng, meta)
z0 = jax.random.normal(rng, (BATCH, meta["latent_dim"]))
cond = jax.jit(lambda b, k: pre(b, rotate=True, rng=k))(batch, rng)
cond = {k: jnp.asarray(v) for k, v in cond.items()}

freq0, phase0 = apply_mapping_network(params["neural_field_mapping_network"], z0)
_, styles0 = apply_two_part_mapping_network(params["synthesis_mapping_network"], z0)

def tick(x):
    return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree_util.tree_leaves(x)) * 1e-30

# A. render (rays + geo + field kernel + integrate)
def step_render(i, carry):
    k = jax.random.fold_in(rng, i)
    f = freq0 + carry
    out = render(params, f, phase0, cond, k, meta, compute_dtype=jnp.bfloat16)
    return tick(out[:2])

# B. geo features alone (KNN + gather + canonicalize) on realistic points
n_pts = meta["render_width"] * meta["render_height"] * meta["num_steps"]
pts0 = jax.random.normal(rng, (BATCH, n_pts, 3))
def step_geo(i, carry):
    g = get_geo_features(pts0 + carry, cond["skeletons_xyz"], cond["vertices"],
                         cond["tpose_vertices"], cond["fk_matrices"],
                         cond["lbs_weights"], use_pallas_knn=True)
    return tick(g)

# C. field kernel alone on packed inputs
geo0 = jax.jit(lambda p: get_geo_features(p, cond["skeletons_xyz"], cond["vertices"],
               cond["tpose_vertices"], cond["fk_matrices"], cond["lbs_weights"],
               use_pallas_knn=True))(pts0)
dirs0 = jax.random.normal(rng, (BATCH, n_pts, 3))
S = meta["num_steps"]
R = n_pts // S
zv0 = jnp.broadcast_to(jnp.linspace(1.0, 2.0, S), (BATCH, R, S))
def step_field(i, carry):
    packed = pack_field_inputs(pts0 + carry, geo0, dirs0, 2.0/meta["side_length"])
    out, d = fused_field_render(params["neural_field"], packed, freq0, phase0, zv0,
                                num_steps=S, tile_rays=TILE,
                                white_back=meta.get("white_back", False),
                                compute_dtype=jnp.bfloat16)
    return tick((out, d))

# D. synthesis kernel alone
from threedhumangan_tpu.ops.synthesis_kernel import fold_synthesis_params, fused_synthesis
folded = fold_synthesis_params(params["synthesis_network"], state["synthesis_network"],
                               params["synthesis_input"], meta["spatial_normalization"])
fm0 = jax.random.normal(rng, (BATCH, meta["gen_height"], meta["gen_width"], meta["feature_dim"]), jnp.float32)
def step_syn(i, carry):
    rgbs = fused_synthesis(folded, fm0 + carry, styles0,
                           num_blocks=meta["synthesis_blocks"],
                           mod_blocks=tuple(meta["mod_blocks"]),
                           map3d_mode=meta.get("map3d_mode", "isolated"),
                           tile_rows=meta.get("pallas_synthesis_tile_rows", 4),
                           compute_dtype=jnp.bfloat16)
    return tick(rgbs)

for name, fn in [("render (rays+geo+field)", step_render), ("geo features", step_geo),
                 ("field kernel", step_field), ("synthesis kernel", step_syn)]:
    per, _ = device_time(fn, n1=2, n2=8)
    print(f"{name:26s}: {per*1000:7.1f} ms/batch")
