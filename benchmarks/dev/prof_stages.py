"""True per-stage device times via the fori_loop differencing harness
(benchmarks/timing.py) — block_until_ready is unreliable under the axon
tunnel, so earlier per-stage numbers measured dispatch, not device time."""
import sys, os
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from benchmarks.timing import device_time, rpc_floor

from threedhumangan_tpu import configs
from threedhumangan_tpu.data.dataset import SyntheticSHHQDataset, iterate_batches
from threedhumangan_tpu.data.preprocessor import get_preprocessor
from threedhumangan_tpu.models.generator import generator_forward, init_generator
from threedhumangan_tpu.models.smpl import synthetic_smpl_model, get_geo_features

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
meta = dict(configs.extract_metadata(configs.MAP3DBN512L, 0))
meta.update(dataset_length=BATCH, nerf_noise=0.0, perturb_rays=False,
            pallas_field=True, pallas_knn=True, pallas_synthesis=True,
            pallas_tile_rays=64, raster_faces_per_tile=512)

smpl = synthetic_smpl_model(num_verts=6890, num_faces=13776)
ds = SyntheticSHHQDataset(smpl_model=smpl, **meta)
pre = get_preprocessor(meta, smpl_model=smpl)
batch = next(iterate_batches(ds, BATCH, shuffle=False))
batch = {k: jnp.asarray(v) for k, v in batch.items()}
rng = jax.random.PRNGKey(0)
params, state = init_generator(rng, meta)
z0 = jax.random.normal(rng, (BATCH, meta["latent_dim"]))

print(f"rpc floor {rpc_floor()*1000:.1f} ms; batch {BATCH}")

def tick(x):  # scalar-ify any pytree
    return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree_util.tree_leaves(x)) * 1e-30

# 1. full pipeline
def step_full(i, carry):
    k = jax.random.fold_in(rng, i)
    k_pre, k_gen = jax.random.split(k)
    z = z0 + carry
    cond = pre(batch, rotate=True, rng=k_pre)
    out, _ = generator_forward(params, state, z, cond, k_gen, meta,
                               train=False, compute_dtype=jnp.bfloat16)
    return tick(out["rgbs"])

# 2. preprocess/rasterize only
def step_pre(i, carry):
    k = jax.random.fold_in(rng, i)
    b2 = dict(batch); b2["vertices"] = batch["vertices"] + carry
    cond = pre(b2, rotate=True, rng=k)
    return tick(cond)

# 3. generator only (condition fixed, precomputed)
cond0 = jax.jit(lambda b, k: pre(b, rotate=True, rng=k))(batch, rng)
cond0 = jax.tree_util.tree_map(lambda x: x, cond0)
def step_gen(i, carry):
    k = jax.random.fold_in(rng, i)
    z = z0 + carry
    out, _ = generator_forward(params, state, z, cond0, k, meta,
                               train=False, compute_dtype=jnp.bfloat16)
    return tick(out["rgbs"])

for name, fn in [("full", step_full), ("preprocess+rasterize", step_pre),
                 ("generator (field+synth)", step_gen)]:
    per, chk = device_time(fn, n1=2, n2=8)
    print(f"{name:28s}: {per*1000:7.1f} ms/batch -> {BATCH/per:6.1f} imgs/s")
