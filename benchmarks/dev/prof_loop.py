"""Profile the production Trainer.run loop segment by segment (VERDICT r4 #1).

The round-4 soak sustained 3.3 imgs/s against a 22.8 imgs/s isolated step.
This harness runs the SAME fixture + Trainer state but times each loop
segment per step: prefetch-queue wait, host->device transfer (shard_batch),
rng split, step dispatch, stats accumulation, the periodic device_get sync,
and log/ckpt/PNG writes.  It also measures the in-process tight-loop step
rate (same compiled step, one resident batch, sync at the end) as the
ceiling the loop should approach.

Usage: python benchmarks/dev/prof_loop.py [--steps 60] [--batch 8]
"""

import argparse
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from soak_train import build_fixture  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--config", type=str, default="MAP3DBN")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--items", type=int, default=32)
    ap.add_argument("--out", type=str, default="/tmp/prof_loop")
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from threedhumangan_tpu import configs
    from threedhumangan_tpu.data.prefetch import prefetch
    from threedhumangan_tpu.models.smpl import synthetic_smpl_model
    from threedhumangan_tpu.parallel.mesh import shard_batch
    from threedhumangan_tpu.trainers.base_trainer import Trainer

    cfg = dict(getattr(configs, args.config))
    cfg["name"] = "prof_loop"
    cfg["dataset"] = "SHHQDataset"
    cfg[0] = dict(cfg[0], batch_size=args.batch)
    cfg["dataset_length"] = args.items

    smpl = synthetic_smpl_model(num_verts=6890, num_faces=13776)
    fixture = os.path.join(args.out, "shhq_fixture")
    meta0 = configs.extract_metadata(cfg, 0)
    if not os.path.isdir(os.path.join(fixture, "images")):
        build_fixture(fixture, smpl, meta0, args.items)
    cfg["dataroot"] = fixture

    opt = types.SimpleNamespace(
        output_dir=args.out, n_epochs=10**9, seed=0, sample_interval=0,
        model_save_interval=10**9, model_keep_interval=10**9, bs_factor=1,
        tensorboard=0)

    trainer = Trainer(0, 1, opt, cfg, smpl_model=smpl)
    meta = trainer._meta_for_step(0)

    # ---- measure one raw batch's host bytes -------------------------------
    data0 = next(iter(trainer.loader_fn(seed=0, shuffle=False)))
    nbytes = sum(np.asarray(v).nbytes for v in data0.values())
    print(f"batch host bytes: {nbytes/1e6:.2f} MB "
          f"({ {k: f'{np.asarray(v).nbytes/1e6:.2f}MB' for k, v in sorted(data0.items(), key=lambda kv: -np.asarray(kv[1]).nbytes)[:5]} })",
          flush=True)

    # ---- warm up: compile the step -----------------------------------------
    t = time.time()
    batch0 = shard_batch({k: jnp.asarray(v) for k, v in data0.items()}, trainer.mesh)
    rng = jax.random.PRNGKey(0)
    phase = meta["phases"][0]
    ts = trainer.ts
    ts, stats = trainer.train_step(
        ts, batch0, rng, phase, lr_g=trainer._cur_lr[0], lr_d=trainer._cur_lr[1],
        nerf_noise=1.0, ada_p=0.0)
    jax.block_until_ready(stats)
    _ = jax.device_get(stats)
    print(f"compile+first step: {time.time()-t:.1f}s", flush=True)

    # phase slots cycle uncond/do_r1 — warm every variant
    for i, ph in enumerate(meta["phases"]):
        ts, stats = trainer.train_step(
            ts, batch0, rng, ph, lr_g=trainer._cur_lr[0], lr_d=trainer._cur_lr[1],
            nerf_noise=1.0, ada_p=0.0)
    _ = jax.device_get(stats)

    # ---- tight-loop ceiling: resident batch, sync at end -------------------
    n_tight = max(args.steps // 2, 16)
    t0 = time.time()
    for i in range(n_tight):
        ph = meta["phases"][i % len(meta["phases"])]
        rng, k = jax.random.split(rng)
        ts, stats = trainer.train_step(
            ts, batch0, k, ph, lr_g=trainer._cur_lr[0], lr_d=trainer._cur_lr[1],
            nerf_noise=1.0, ada_p=0.0)
    jax.block_until_ready(stats)
    dt = time.time() - t0
    tight = n_tight * args.batch / dt
    print(f"tight loop (resident batch, host rng-split per step): "
          f"{tight:.2f} imgs/s  ({dt/n_tight*1e3:.1f} ms/step)", flush=True)

    # ---- segment-timed production-style loop --------------------------------
    trainer.ts = ts
    seg = {k: 0.0 for k in ("data_wait", "h2d", "rng", "dispatch",
                            "stats_acc", "sync", "log")}
    counts = {"steps": 0, "syncs": 0}
    stats_acc = None
    step = 0
    t_loop0 = time.time()
    it = None
    while step < args.steps:
        if it is None:
            it = prefetch(trainer.loader_fn(seed=step, shuffle=True))
        t = time.time()
        try:
            data = next(it)
        except StopIteration:
            it = None  # epoch boundary: restart the loader (ref run loop)
            seg["data_wait"] += time.time() - t
            continue
        seg["data_wait"] += time.time() - t
        ph = meta["phases"][step % len(meta["phases"])]
        if True:
            t = time.time()
            batch = shard_batch({k: jnp.asarray(v) for k, v in data.items()},
                                trainer.mesh)
            seg["h2d"] += time.time() - t
            t = time.time()
            trainer.rng, k = jax.random.split(trainer.rng)
            seg["rng"] += time.time() - t
            t = time.time()
            trainer.ts, stats = trainer.train_step(
                trainer.ts, batch, k, ph,
                lr_g=trainer._cur_lr[0], lr_d=trainer._cur_lr[1],
                nerf_noise=1.0, ada_p=0.0)
            seg["dispatch"] += time.time() - t
            t = time.time()
            if stats_acc is None:
                stats_acc = dict(stats)
            else:
                for kk, v in stats.items():
                    stats_acc[kk] = jnp.add(stats_acc[kk], v)
            seg["stats_acc"] += time.time() - t
            step += 1
            if step % 10 == 0:
                t = time.time()
                host = jax.device_get(stats_acc)
                stats_acc = None
                seg["sync"] += time.time() - t
                counts["syncs"] += 1
    # final sync
    t = time.time()
    jax.block_until_ready(trainer.ts.params_G)
    seg["sync"] += time.time() - t
    total = time.time() - t_loop0
    counts["steps"] = step

    print(f"\nproduction-style loop: {step} steps in {total:.1f}s = "
          f"{step*args.batch/total:.2f} imgs/s", flush=True)
    acc = 0.0
    for k, v in sorted(seg.items(), key=lambda kv: -kv[1]):
        print(f"  {k:10s} {v:7.2f}s  ({v/step*1e3:6.1f} ms/step)")
        acc += v
    print(f"  {'unattributed':10s} {total-acc:7.2f}s  ({(total-acc)/step*1e3:6.1f} ms/step)"
          f"  [data wait + python + epoch restarts]")
    print(f"\ntight={tight:.2f} imgs/s  loop={step*args.batch/total:.2f} imgs/s  "
          f"ratio={step*args.batch/total/tight:.2f}")


if __name__ == "__main__":
    main()
