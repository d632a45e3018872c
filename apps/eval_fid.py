"""FID-style evaluation: generated samples vs dataset images.

Computes the Frechet distance between feature statistics of N generated
images and N dataset images (utils/fid.py).  With Inception weights absent
(offline environment) the features come from a fixed-random VGG16 — a
deterministic two-sample discrepancy comparable ACROSS runs of this
framework, not to published Inception-FID numbers (printed in the output).
Supply ``INCEPTION_WEIGHTS_NPZ``/``VGG16_WEIGHTS_NPZ`` for standard features.

Usage:
  python apps/eval_fid.py --config MAP3DBN_TINY --n 64 [--checkpoint ckpt]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.getcwd())

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="MAP3DBN_TINY")
    parser.add_argument("--tune", type=str, default="")
    parser.add_argument("--variant", type=int, default=0)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--n", type=int, default=64)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", type=str, default=None)
    opt = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)

    from threedhumangan_tpu import configs
    from threedhumangan_tpu.data import get_dataset, get_preprocessor
    from threedhumangan_tpu.data.dataset import iterate_batches
    from threedhumangan_tpu.models.generator import init_generator, staged_forward
    from threedhumangan_tpu.utils.checkpoint import load_checkpoint
    from threedhumangan_tpu.utils import fid as fid_mod

    config = configs.get_config(opt)
    config = {k: v for k, v in config.items() if isinstance(k, str)}
    config["truncation_psi"] = 0.7
    config["h_stddev"] = config["v_stddev"] = 0
    config["nerf_noise"] = 0
    config["perturb_rays"] = False
    config["dataset_length"] = max(config.get("dataset_length", opt.n), opt.n)

    key = jax.random.PRNGKey(opt.seed)
    params, state = init_generator(key, config)
    if opt.checkpoint and os.path.exists(opt.checkpoint):
        payload = load_checkpoint(opt.checkpoint)
        params = jax.tree.map(jnp.asarray, payload["train_state"]["ema"]["params"])
        state = jax.tree.map(jnp.asarray, payload["train_state"]["state_G"])

    loader, dataset = get_dataset(config["dataset"], batch_size=opt.batch, **config)
    pre = get_preprocessor(config, smpl_model=dataset.smpl_model)

    import functools

    @functools.partial(jax.jit)
    def gen_batch(batch, z, rng):
        k_pre, k_gen = jax.random.split(rng)
        cond = pre(batch, rotate=False, rng=k_pre)
        out, _ = staged_forward(params, state, z, cond, k_gen, config)
        return jnp.clip(out["rgbs"], -1, 1)

    reals, fakes = [], []
    done = 0
    for i, data in enumerate(iterate_batches(dataset, opt.batch, shuffle=False)):
        if done >= opt.n:
            break
        batch = {k: jnp.asarray(v) for k, v in data.items()}
        z = jax.random.normal(jax.random.fold_in(key, i), (opt.batch, config["latent_dim"]))
        fakes.append(np.asarray(gen_batch(batch, z, jax.random.fold_in(key, 1000 + i))))
        reals.append(np.asarray(data["images"]))
        done += opt.batch

    reals = np.concatenate(reals)[: opt.n]
    fakes = np.concatenate(fakes)[: opt.n]

    value = fid_mod.fid_between(fakes, reals)
    weights = "inception/vgg npz" if os.environ.get("VGG16_WEIGHTS_NPZ") else "fixed-random VGG16"
    print(json.dumps({
        "metric": f"frechet feature distance ({weights}; NOT Inception-FID unless weights supplied)",
        "value": round(float(value), 4),
        "n": int(opt.n),
    }))


if __name__ == "__main__":
    main()
    import sys

    sys.stdout.flush()
    os._exit(0)
