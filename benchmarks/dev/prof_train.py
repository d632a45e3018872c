"""Training-step attribution: D step, G step, G-without-synthesis
(true device times, fori_loop harness)."""
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
meta = dict(configs.extract_metadata(getattr(configs, CFG), 0))
meta["dataset_length"] = B
on_acc = jax.default_backend() not in ("cpu",)
meta["pallas_knn"] = on_acc
meta["pallas_field"] = on_acc
meta["pallas_raster"] = on_acc

smpl = synthetic_smpl_model(num_verts=6890, num_faces=13776)
ds = SyntheticSHHQDataset(smpl_model=smpl, **meta)
pre = get_preprocessor(meta, smpl_model=smpl)
batch = {k: jnp.asarray(v) for k, v in next(iterate_batches(ds, B, shuffle=False)).items()}
rng = jax.random.PRNGKey(0)
ts0 = init_train_state(rng, meta)
lr = jnp.float32(1e-4)
noise = jnp.float32(0.5)

def tick(x):
    return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree_util.tree_leaves(x)) * 1e-30

def mk(phase, which):
    def step(i, carry):
        k = jax.random.fold_in(rng, i)
        ts = ts0._replace(step=ts0.step + (carry * 1e-30).astype(jnp.int32))
        fn = d_train_step if which == "d" else g_train_step
        ts2, stats = fn(ts, batch, k, lr, noise, pre, meta, phase)
        return tick(ts2.params_D if which == "d" else ts2.params_G)
    return step

ph = {"rotate": True, "do_r1": True, "uncond": True, "gen_modal": "rgbs"}
ph_nor1 = dict(ph, do_r1=False)
ph_nosyn = dict(ph, gen_modal="rgbs_render")

for name, step in [
    ("D step (R1 on)", mk(ph, "d")),
    ("D step (R1 off)", mk(ph_nor1, "d")),
    ("G step (full)", mk(ph, "g")),
    ("G step (no synthesis)", mk(ph_nosyn, "g")),
]:
    per, _ = device_time(step, n1=2, n2=6)
    print(f"{name:24s}: {per*1000:7.1f} ms/batch{B} -> {B/per:5.1f} imgs/s", flush=True)
