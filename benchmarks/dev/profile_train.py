import jax, jax.numpy as jnp, time
from threedhumangan_tpu import configs
from threedhumangan_tpu.data.dataset import SyntheticSHHQDataset, iterate_batches
from threedhumangan_tpu.data.preprocessor import get_preprocessor
from threedhumangan_tpu.models.smpl import synthetic_smpl_model
from threedhumangan_tpu.trainers.phase_trainer import (
    init_train_state, _d_step_jit, _g_step_jit, register_meta)

B = 8
meta = dict(configs.extract_metadata(configs.MAP3DBN, 0))
meta["dataset_length"] = B
meta["pallas_knn"] = True
smpl = synthetic_smpl_model(num_verts=6890, num_faces=13776)
ds = SyntheticSHHQDataset(smpl_model=smpl, **meta)
pre = get_preprocessor(meta, smpl_model=smpl)
batch = next(iterate_batches(ds, B, shuffle=False))
batch = {k: jnp.asarray(v) for k, v in batch.items()}
rng = jax.random.PRNGKey(0)
ts = init_train_state(rng, meta)
mh = register_meta(meta)

def timeit(name, fn, iters=4):
    out = fn(0); jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(i + 1)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.1f} ms")
    return out

lr = jnp.float32(1e-4); noise = jnp.float32(0.5); ada = jnp.float32(0.0)
for pname, (rot, r1) in [("phase0 (no r1)", (False, False)), ("phase3 (r1)", (False, True))]:
    d = lambda i: _d_step_jit(ts, batch, jax.random.fold_in(rng, i), lr, noise, ada,
                              pre, mh, rot, r1, True, "rgbs")[0]
    timeit(f"D step {pname}", d)
g = lambda i: _g_step_jit(ts, batch, jax.random.fold_in(rng, 100+i), lr, noise, ada,
                          pre, mh, False, False, True, "rgbs")[0]
timeit("G step", g)
