import jax, jax.numpy as jnp, time
from threedhumangan_tpu import configs
from threedhumangan_tpu.data.dataset import SyntheticSHHQDataset, iterate_batches
from threedhumangan_tpu.data.preprocessor import get_preprocessor
from threedhumangan_tpu.models.generator import init_generator, render, generator_forward
from threedhumangan_tpu.models.smpl import synthetic_smpl_model, get_geo_features
from threedhumangan_tpu.models import synthesis as syn
from threedhumangan_tpu.models.mapping import apply_mapping_network, apply_two_part_mapping_network

B = 8
meta = dict(configs.extract_metadata(configs.MAP3DBN512L, 0))
meta.update(dataset_length=B, nerf_noise=0.0, perturb_rays=False,
            pallas_field=True, pallas_tile_rays=64, pallas_knn=True)
smpl = synthetic_smpl_model(num_verts=6890, num_faces=13776)
ds = SyntheticSHHQDataset(smpl_model=smpl, **meta)
pre = get_preprocessor(meta, smpl_model=smpl)
batch = next(iterate_batches(ds, B, shuffle=False))
batch = {k: jnp.asarray(v) for k, v in batch.items()}
rng = jax.random.PRNGKey(0)
params, state = init_generator(rng, meta)
z = jax.random.normal(rng, (B, meta["latent_dim"]))

def timeit(name, fn, *a):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5): out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/5*1000:.1f} ms")
    return out

# 1. preprocessor (rasterize 512x256 x 13776 faces)
pre_fn = jax.jit(lambda d, k: pre(d, True, k))
cond = timeit("preprocess+rasterize", pre_fn, batch, rng)

# 2. full render (geo+field+integrate, pallas)
def render_fn(params, z, cond, k):
    freq, phase = apply_mapping_network(params["neural_field_mapping_network"], jnp.zeros_like(z))
    return render(params, freq, phase, cond, k, meta, jnp.bfloat16, nerf_noise=0.0)[1]
fm = timeit("render(field pallas)", jax.jit(render_fn), params, z, cond, rng)

# 2b. geo features alone
def geo_fn(cond):
    import threedhumangan_tpu.models.volume_rendering as vr
    pts = jax.random.normal(jax.random.PRNGKey(1), (B, meta["render_width"]*meta["render_height"]*meta["num_steps"], 3))
    return get_geo_features(pts, cond["skeletons_xyz"], cond["vertices"], cond["tpose_vertices"], cond["fk_matrices"], cond["lbs_weights"], use_pallas_knn=True)
timeit("geo_features(KNN)", jax.jit(geo_fn), cond)

# 3. synthesis alone
smeta = {"num_blocks": meta["synthesis_blocks"], "mod_blocks": tuple(meta["mod_blocks"]),
         "spatial_normalization": meta["spatial_normalization"], "map3d_mode": meta["map3d_mode"]}
fm_up = jax.image.resize(fm, (B, meta["gen_height"], meta["gen_width"], fm.shape[-1]), "bilinear")
coords = syn.get_2d_coords(B, meta["gen_height"], meta["gen_width"])
def syn_fn(params, fm_up, styles):
    x = syn.apply_synthesis_input(params["synthesis_input"], coords, jnp.bfloat16)
    out, _ = syn.apply_synthesis_network(params["synthesis_network"], state["synthesis_network"],
                                         smeta, x, fm_up, styles, compute_dtype=jnp.bfloat16)
    return out["final"]
_, styles = apply_two_part_mapping_network(params["synthesis_mapping_network"], z)
timeit("synthesis(9 SPADE blocks)", jax.jit(syn_fn), params, fm_up, styles)

# 4. e2e
e2e = jax.jit(lambda p, z, d, k: generator_forward(p, state, z, pre(d, True, k), k, meta, compute_dtype=jnp.bfloat16)[0]["rgbs"])
timeit("end-to-end", e2e, params, z, batch, rng)
