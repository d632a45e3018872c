"""BASELINE.json configs #4 and #5: discriminator-fwd + R1 microbench and
full adversarial training-step throughput.

Prints one JSON line per benchmark (the driver's headline bench stays
bench.py at the repo root).

Usage:  python benchmarks/bench_train.py [--config MAP3DBN] [--batch 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="MAP3DBN")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--platform", type=str, default=None)
    opt = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)

    from threedhumangan_tpu import configs
    from threedhumangan_tpu.data.dataset import SyntheticSHHQDataset, iterate_batches
    from threedhumangan_tpu.data.preprocessor import get_preprocessor
    from threedhumangan_tpu.models.discriminator import discriminator_forward, init_discriminator
    from threedhumangan_tpu.models.smpl import synthetic_smpl_model
    from threedhumangan_tpu.trainers import losses as L
    from threedhumangan_tpu.trainers.phase_trainer import init_train_state, train_step_pair

    meta = dict(configs.extract_metadata(getattr(configs, opt.config), 0))
    meta["dataset_length"] = opt.batch
    meta["pallas_knn"] = jax.default_backend() not in ("cpu",)
    meta["pallas_field"] = meta["pallas_knn"]
    meta["pallas_raster"] = meta["pallas_knn"]

    B = opt.batch
    smpl = synthetic_smpl_model(num_verts=6890, num_faces=13776)
    ds = SyntheticSHHQDataset(smpl_model=smpl, **meta)
    pre = get_preprocessor(meta, smpl_model=smpl)
    batch = next(iterate_batches(ds, B, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)

    # ---- #4: D forward + R1 on real batches ----
    params_D, state_D = init_discriminator(rng, meta)
    H, W = meta["gen_height"], meta["gen_width"]
    real = jax.random.normal(rng, (B, H, W, 3))

    @jax.jit
    def d_r1(params_D, real):
        d_fn = lambda img: discriminator_forward(params_D, state_D, img, train=False)[0]
        out, _ = discriminator_forward(params_D, state_D, real, train=True)
        r1 = L.r1_regularization(d_fn, real, r1_lambda=0.25, gan_lambda=0,
                                 segmentation_lambda=1)
        return jnp.sum(out["segments"]) + r1

    jax.block_until_ready(d_r1(params_D, real))
    t0 = time.perf_counter()
    for _ in range(opt.iters):
        r = d_r1(params_D, real)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / opt.iters
    print(json.dumps({
        "metric": f"D fwd + R1 gradient penalty ({H}x{W})",
        "value": round(B / dt, 3), "unit": "imgs/sec/chip"}))

    # ---- #5: full adversarial training step (G + D + pose-mapping) ----
    ts = init_train_state(rng, meta)
    phase = meta["phases"][3]  # rotate=False, do_r1=True — the heaviest slot

    def step(ts, rng):
        return train_step_pair(ts, batch, rng, meta, pre, phase,
                               lr_g=1e-4, lr_d=4e-4, nerf_noise=0.5)

    ts, _ = step(ts, rng)
    jax.block_until_ready(ts.params_D)
    t0 = time.perf_counter()
    for i in range(opt.iters):
        ts, _ = step(ts, jax.random.fold_in(rng, i))
    jax.block_until_ready(ts.params_D)
    dt = (time.perf_counter() - t0) / opt.iters
    print(json.dumps({
        "metric": f"full adversarial training step ({opt.config}, D+G+R1, batch {B})",
        "value": round(B / dt, 3), "unit": "imgs/sec/chip"}))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
