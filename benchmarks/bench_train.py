"""BASELINE.json configs #4 and #5: discriminator-fwd + R1 microbench and
full adversarial training-step throughput.

Prints one JSON line per benchmark (the driver's headline bench stays
bench.py at the repo root).

Measurement: true device time via the fori_loop differencing harness
(benchmarks/timing.py) — the whole D+G pair runs inside ONE jit with a
scalar carry threaded through the step counter, so neither dispatch/RPC
overhead nor the tunnel's non-blocking block_until_ready distorts the
number.

Usage:  python benchmarks/bench_train.py [--config MAP3DBN] [--batch 8]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.getcwd())


def measure_train_step(config: str = "MAP3DBN", batch: int = 8,
                       n1: int = 2, n2: int = 6) -> float:
    """Measure the full adversarial D+G+R1 training step (BASELINE.json #5)
    at stock accelerator defaults; returns imgs/sec/chip.  Shared by this
    script and bench.py (which embeds the number in the driver-captured
    JSON line — VERDICT r4 #10)."""
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import device_time
    from threedhumangan_tpu import configs
    from threedhumangan_tpu.data.dataset import SyntheticSHHQDataset, iterate_batches
    from threedhumangan_tpu.data.preprocessor import get_preprocessor
    from threedhumangan_tpu.models.smpl import synthetic_smpl_model
    from threedhumangan_tpu.trainers.phase_trainer import (
        d_train_step,
        g_train_step,
        init_train_state,
    )

    meta = dict(configs.extract_metadata(getattr(configs, config), 0))
    meta["dataset_length"] = batch
    on_acc = jax.default_backend() not in ("cpu",)
    for k in ("pallas_knn", "pallas_geo", "pallas_field", "pallas_raster",
              "pallas_synthesis_train"):
        meta[k] = on_acc
    if meta["pallas_synthesis_train"]:
        from threedhumangan_tpu.models.generator import auto_remat_synthesis
        micro = max(1, batch // int(meta.get("batch_split", 1)))
        meta.setdefault("remat_synthesis", auto_remat_synthesis(meta, micro))

    smpl = synthetic_smpl_model(num_verts=6890, num_faces=13776)
    ds = SyntheticSHHQDataset(smpl_model=smpl, **meta)
    pre = get_preprocessor(meta, smpl_model=smpl)
    data = next(iterate_batches(ds, batch, shuffle=False))
    data = {k: jnp.asarray(v) for k, v in data.items()}
    rng = jax.random.PRNGKey(0)

    def tick(x):
        return sum(jnp.sum(v.astype(jnp.float32))
                   for v in jax.tree_util.tree_leaves(x)) * 1e-30

    ts0 = init_train_state(rng, meta)
    phase = meta["phases"][3]  # do_r1=True — the heaviest slot

    def pair_step(i, carry):
        k = jax.random.fold_in(rng, i)
        kd, kg = jax.random.split(k)
        ts = ts0._replace(step=ts0.step + (carry * 1e-30).astype(jnp.int32))
        ts, _ = d_train_step(ts, data, kd, jnp.float32(4e-4), jnp.float32(0.5),
                             pre, meta, phase)
        ts, _ = g_train_step(ts, data, kg, jnp.float32(1e-4), jnp.float32(0.5),
                             pre, meta, phase)
        return tick(ts.params_G) + tick(ts.params_D)

    per, _ = device_time(pair_step, n1=n1, n2=n2)
    return batch / per


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="MAP3DBN")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--batch_split", type=int, default=0,
                        help="micro-batch count (lax.scan gradient "
                             "accumulation); 0 keeps the config default")
    parser.add_argument("--platform", type=str, default=None)
    opt = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from benchmarks.timing import device_time
    from threedhumangan_tpu import configs
    from threedhumangan_tpu.data.dataset import SyntheticSHHQDataset, iterate_batches
    from threedhumangan_tpu.data.preprocessor import get_preprocessor
    from threedhumangan_tpu.models.discriminator import discriminator_forward, init_discriminator
    from threedhumangan_tpu.models.smpl import synthetic_smpl_model
    from threedhumangan_tpu.trainers import losses as L
    from threedhumangan_tpu.trainers.phase_trainer import (
        d_train_step,
        g_train_step,
        init_train_state,
    )

    meta = dict(configs.extract_metadata(getattr(configs, opt.config), 0))
    meta["dataset_length"] = opt.batch
    on_acc = jax.default_backend() not in ("cpu",)
    meta["pallas_knn"] = on_acc
    meta["pallas_geo"] = on_acc and os.environ.get("BENCH_PALLAS_GEO", "1") == "1"
    meta["pallas_field"] = on_acc
    meta["pallas_raster"] = on_acc
    # trainable fused synthesis half-blocks (ops/synthesis_train.py)
    meta["pallas_synthesis_train"] = (
        on_acc and os.environ.get("BENCH_SYNTH_TRAIN", "1") == "1")
    if opt.batch_split:
        meta["batch_split"] = opt.batch_split
    if meta["pallas_synthesis_train"]:
        from threedhumangan_tpu.models.generator import auto_remat_synthesis
        micro = max(1, opt.batch // int(meta.get("batch_split", 1)))
        meta.setdefault("remat_synthesis", auto_remat_synthesis(meta, micro))
    if os.environ.get("BENCH_SYNTH_TRAIN_TILE"):
        meta["pallas_synthesis_train_tile_rows"] = int(
            os.environ["BENCH_SYNTH_TRAIN_TILE"])
    if os.environ.get("BENCH_MARCH_LOOP"):
        meta["pallas_march_loop"] = os.environ["BENCH_MARCH_LOOP"] == "1"
    if os.environ.get("BENCH_TILE_RAYS"):
        meta["pallas_tile_rays"] = int(os.environ["BENCH_TILE_RAYS"])

    B = opt.batch
    smpl = synthetic_smpl_model(num_verts=6890, num_faces=13776)
    ds = SyntheticSHHQDataset(smpl_model=smpl, **meta)
    pre = get_preprocessor(meta, smpl_model=smpl)
    batch = next(iterate_batches(ds, B, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)

    def tick(x):
        return sum(jnp.sum(v.astype(jnp.float32))
                   for v in jax.tree_util.tree_leaves(x)) * 1e-30

    # ---- #4: D forward + R1 on real batches ----
    params_D, state_D = init_discriminator(rng, meta)
    H, W = meta["gen_height"], meta["gen_width"]
    real = jax.random.normal(rng, (B, H, W, 3))

    def d_r1_step(i, carry):
        img = real + carry
        d_fn = lambda im: discriminator_forward(params_D, state_D, im, train=False)[0]
        out, _ = discriminator_forward(params_D, state_D, img, train=True)
        r1 = L.r1_regularization(d_fn, img, r1_lambda=0.25, gan_lambda=0,
                                 segmentation_lambda=1)
        return (jnp.sum(out["segments"]) + r1) * 1e-30

    per, _ = device_time(d_r1_step, n1=2, n2=8)
    print(json.dumps({
        "metric": f"D fwd + R1 gradient penalty ({H}x{W})",
        "value": round(B / per, 3), "unit": "imgs/sec/chip"}), flush=True)

    # ---- #5: full adversarial training step (D + G + pose-mapping) ----
    ts0 = init_train_state(rng, meta)
    phase = meta["phases"][3]  # do_r1=True — the heaviest slot
    lr_g = jnp.float32(1e-4)
    lr_d = jnp.float32(4e-4)
    noise = jnp.float32(0.5)

    def pair_step(i, carry):
        k = jax.random.fold_in(rng, i)
        kd, kg = jax.random.split(k)
        ts = ts0._replace(step=ts0.step + (carry * 1e-30).astype(jnp.int32))
        ts, _ = d_train_step(ts, batch, kd, lr_d, noise, pre, meta, phase)
        ts, _ = g_train_step(ts, batch, kg, lr_g, noise, pre, meta, phase)
        return tick(ts.params_G) + tick(ts.params_D)

    per, _ = device_time(pair_step, n1=2, n2=6)
    print(json.dumps({
        "metric": f"full adversarial training step ({opt.config}, D+G+R1, batch {B})",
        "value": round(B / per, 3), "unit": "imgs/sec/chip"}), flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
