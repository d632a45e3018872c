"""Fine-grained training-step attribution (true device times).

Breaks the G/D steps of BENCH_CONFIG (default MAP3DBN, the BASELINE #5
training config) into isolated sub-stages so PERFORMANCE.md can carry a
training roofline: preprocess+raster, G fwd (train mode, as the D step
pays for fakes), G fwd+bwd without D, D fwd, D fwd+bwd, R1 increment.
"""
import sys, os
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from benchmarks.timing import device_time, rpc_floor

from threedhumangan_tpu import configs
from threedhumangan_tpu.data.dataset import SyntheticSHHQDataset, iterate_batches
from threedhumangan_tpu.data.preprocessor import get_preprocessor
from threedhumangan_tpu.models.discriminator import discriminator_forward
from threedhumangan_tpu.models.generator import generator_forward
from threedhumangan_tpu.models.smpl import synthetic_smpl_model
from threedhumangan_tpu.trainers.phase_trainer import init_train_state

B = int(os.environ.get("BENCH_BATCH", "8"))
CFG = os.environ.get("BENCH_CONFIG", "MAP3DBN")
meta = dict(configs.extract_metadata(getattr(configs, CFG), 0))
meta["dataset_length"] = B
on_acc = jax.default_backend() not in ("cpu",)
meta["pallas_knn"] = on_acc
meta["pallas_geo"] = on_acc and os.environ.get("BENCH_PALLAS_GEO", "1") == "1"
meta["pallas_field"] = on_acc
meta["pallas_raster"] = on_acc
meta["pallas_synthesis_train"] = (
    on_acc and os.environ.get("BENCH_SYNTH_TRAIN", "1") == "1")
if meta["pallas_synthesis_train"]:
    meta.setdefault("remat_synthesis", False)
for k, v in os.environ.items():
    if k.startswith("BENCH_META_"):
        key = k[len("BENCH_META_"):].lower()
        meta[key] = type(meta.get(key, v))(eval(v)) if key in meta else eval(v)

smpl = synthetic_smpl_model(num_verts=6890, num_faces=13776)
ds = SyntheticSHHQDataset(smpl_model=smpl, **meta)
pre = get_preprocessor(meta, smpl_model=smpl)
batch = {k: jnp.asarray(v) for k, v in next(iterate_batches(ds, B, shuffle=False)).items()}
rng = jax.random.PRNGKey(0)
ts = init_train_state(rng, meta)
noise = jnp.float32(0.5)
cdt = jnp.bfloat16

print(f"rpc floor {rpc_floor()*1000:.1f} ms; batch {B} config {CFG} "
      f"gen {meta['gen_height']}x{meta['gen_width']}", flush=True)

def tick(x):
    return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree_util.tree_leaves(x)) * 1e-30

data0 = jax.jit(lambda b, k: pre(b, rotate=True, rng=k))(batch, rng)
z0 = jax.random.normal(rng, (B, meta["latent_dim"]))

def g_fwd(params_G, sG, z, key, pallas_ok):
    out, sG2 = generator_forward(
        params_G, sG, z, data0, key, meta, train=True, compute_dtype=cdt,
        nerf_noise=noise, pallas_ok=pallas_ok)
    return out, sG2

stages = {}

def st_pre(i, c):
    d = pre(batch, rotate=True, rng=jax.random.fold_in(rng, i))
    return tick((d["rasterized_segments"], d["rasterized_semantics"]))
stages["preprocess+raster"] = st_pre

def st_gfwd(i, c):
    out, sG2 = g_fwd(ts.params_G, ts.state_G, z0 + c, jax.random.fold_in(rng, i), True)
    return tick(out["rgbs"])
stages["G fwd train (D-step fakes path)"] = st_gfwd

def st_gfwd_nosyn(i, c):
    out, sG2 = generator_forward(
        ts.params_G, ts.state_G, z0 + c, data0, jax.random.fold_in(rng, i),
        meta, train=True, compute_dtype=cdt, nerf_noise=noise,
        disable_synthesis=True, pallas_ok=True)
    return tick(out["rgbs"])
stages["G fwd train, no synthesis"] = st_gfwd_nosyn

def st_gbwd(i, c):
    def loss(pG):
        out, _ = g_fwd(pG, ts.state_G, z0 + c, jax.random.fold_in(rng, i), False)
        return jnp.sum(out["rgbs"].astype(jnp.float32) ** 2) * 1e-12
    g = jax.grad(loss)(ts.params_G)
    return tick(g)
stages["G fwd+bwd (no D)"] = st_gbwd

def st_gbwd_nosyn(i, c):
    def loss(pG):
        out, _ = generator_forward(
            pG, ts.state_G, z0 + c, data0, jax.random.fold_in(rng, i),
            meta, train=True, compute_dtype=cdt, nerf_noise=noise,
            disable_synthesis=True, pallas_ok=False)
        return jnp.sum(out["rgbs"].astype(jnp.float32) ** 2) * 1e-12
    g = jax.grad(loss)(ts.params_G)
    return tick(g)
stages["G fwd+bwd no synthesis"] = st_gbwd_nosyn

imgs = jax.random.normal(rng, (B, meta["gen_height"], meta["gen_width"], 3))

def st_dfwd(i, c):
    out, _ = discriminator_forward(ts.params_D, ts.state_D, imgs + c, data0,
                                   train=True, compute_dtype=cdt)
    return tick(out["prediction"]) + tick(out["segments"])
stages["D fwd train"] = st_dfwd

def st_dbwd(i, c):
    def loss(pD):
        out, _ = discriminator_forward(pD, ts.state_D, imgs + c, data0,
                                       train=True, compute_dtype=cdt)
        return jnp.sum(out["segments"].astype(jnp.float32) ** 2) * 1e-12
    return tick(jax.grad(loss)(ts.params_D))
stages["D fwd+bwd"] = st_dbwd

from threedhumangan_tpu.trainers import losses as L

def st_r1(i, c):
    d_fn = lambda im: discriminator_forward(ts.params_D, ts.state_D, im, data0,
                                            train=False, compute_dtype=cdt)[0]
    return L.r1_regularization(d_fn, imgs + c, 0.25, 0, 1) * 1e-20
stages["R1 penalty (double grad)"] = st_r1

only = [s for s in os.environ.get("BENCH_STAGES", "").split(",") if s]
for name, fn in stages.items():
    if only and name not in only:
        continue
    per, _ = device_time(fn, n1=2, n2=6)
    print(f"{name:34s}: {per*1000:8.2f} ms/batch{B}", flush=True)
