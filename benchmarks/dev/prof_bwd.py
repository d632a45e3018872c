"""G-step with the Pallas backward kernel + full-pair HBM fit check."""
import sys, os
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from benchmarks.timing import device_time
from threedhumangan_tpu import configs
from threedhumangan_tpu.data.dataset import SyntheticSHHQDataset, iterate_batches
from threedhumangan_tpu.data.preprocessor import get_preprocessor
from threedhumangan_tpu.models.smpl import synthetic_smpl_model
from threedhumangan_tpu.trainers.phase_trainer import (
    d_train_step, g_train_step, init_train_state)

B = int(os.environ.get("BENCH_BATCH", "8"))
CFG = os.environ.get("BENCH_CONFIG", "MAP3DBN")
base = dict(configs.extract_metadata(getattr(configs, CFG), 0))
base["dataset_length"] = B
on_acc = jax.default_backend() not in ("cpu",)
for k in ("pallas_knn", "pallas_field", "pallas_raster"):
    base[k] = on_acc

smpl = synthetic_smpl_model(num_verts=6890, num_faces=13776)
ds = SyntheticSHHQDataset(smpl_model=smpl, **base)
pre = get_preprocessor(base, smpl_model=smpl)
batch = {k: jnp.asarray(v) for k, v in next(iterate_batches(ds, B, shuffle=False)).items()}
rng = jax.random.PRNGKey(0)
ts0 = init_train_state(rng, base)
lr = jnp.float32(1e-4); noise = jnp.float32(0.5)
ph = {"rotate": True, "do_r1": True, "uncond": True, "gen_modal": "rgbs"}

def tick(x):
    return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree_util.tree_leaves(x)) * 1e-30

# G step with pallas bwd x remat
for rs in (False, True):
    meta = dict(base, remat_synthesis=rs, pallas_field_bwd=True)
    def step(i, carry, meta=meta):
        k = jax.random.fold_in(rng, i)
        ts = ts0._replace(step=ts0.step + (carry * 1e-30).astype(jnp.int32))
        ts2, _ = g_train_step(ts, batch, k, lr, noise, pre, meta, ph)
        return tick(ts2.params_G)
    try:
        per, _ = device_time(step, n1=2, n2=6)
        print(f"G pallas_bwd remat_syn={int(rs)}: {per*1000:7.1f} ms/batch{B}", flush=True)
    except Exception as e:
        print(f"G pallas_bwd remat_syn={int(rs)}: FAILED {type(e).__name__} {str(e)[:200]}", flush=True)

# full D+G pair at best settings
meta = dict(base, remat_synthesis=False, pallas_field_bwd=True)
def pair(i, carry):
    k = jax.random.fold_in(rng, i)
    kd, kg = jax.random.split(k)
    ts = ts0._replace(step=ts0.step + (carry * 1e-30).astype(jnp.int32))
    ts1, _ = d_train_step(ts, batch, kd, lr, noise, pre, meta, ph)
    ts2, _ = g_train_step(ts1, batch, kg, lr, noise, pre, meta, ph)
    return tick(ts2.params_G) + tick(ts2.params_D)
try:
    per, _ = device_time(pair, n1=2, n2=6)
    print(f"full pair (best): {per*1000:7.1f} ms/batch{B} -> {B/per:5.2f} imgs/s", flush=True)
except Exception as e:
    print(f"full pair (best): FAILED {type(e).__name__} {str(e)[:200]}", flush=True)
