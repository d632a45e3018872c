"""Asset-ready parity harness vs the released reference checkpoint.

One command that, given whatever assets are present, does as much of the
parity pipeline as possible (VERDICT round-2 item #4):

  1. ``--torch_checkpoint``: the released ``map3dbn512l`` EMA state_dict
     (key space: reference apps/sample_from_generator.py:109-111; legacy
     420-dim config at reference configs/map3d.py:253).  Converted via
     utils.torch_convert; absent -> deterministic random init (synthetic
     mode, still exercises every code path).
  2. Renders ``--seeds`` fixed identities at fixed poses/cameras with the
     reference eval settings (psi=0.7, h/v_stddev=0, nerf_noise=0,
     ref :94-99) — fully deterministic.
  3. ``--goldens``: a directory of reference-rendered goldens
     (``seed_{s:03d}.npy`` float32 HWC in [-1, 1]).  Reports per-pixel
     deltas per seed and a feature-space Frechet distance over the set
     (real Inception-pool3 when INCEPTION_WEIGHTS_NPZ is set, labelled
     fallback otherwise).
  4. ``--write_goldens``: write this run's renders in the golden layout
     (run once against reference outputs, or to pin a regression baseline).

Prints one JSON summary line; every asset is optional so the command always
runs to completion (synthetic-mode test: tests/test_eval_parity.py).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="MAP3DBN512L")
    p.add_argument("--torch_checkpoint", type=str, default="",
                   help="released EMA state_dict (.pth/.pkl); optional")
    p.add_argument("--goldens", type=str, default="",
                   help="dir of reference-rendered seed_{s:03d}.npy goldens")
    p.add_argument("--write_goldens", type=str, default="",
                   help="write this run's renders as goldens to this dir")
    p.add_argument("--seeds", nargs="+", type=int, default=list(range(1, 9)))
    p.add_argument("--dataroot", type=str, default="synthetic")
    p.add_argument("--dataset_length", type=int, default=8)
    p.add_argument("--output_dir", type=str, default="results/eval_parity")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--tune", type=str, default="")
    p.add_argument("--variant", type=int, default=0)
    return p.parse_args()


def render_seed(params, state, preprocessor, config, seed, conditions, avg_latent):
    """One deterministic 512x256 render for a fixed seed + pose."""
    import jax
    import jax.numpy as jnp

    from threedhumangan_tpu.models.generator import staged_forward

    cond = preprocessor.forward_with_rotation(
        conditions, jnp.zeros((1,)), jnp.zeros((1,)), jnp.zeros((1,)))
    z = jax.random.normal(jax.random.PRNGKey(seed), (1, config["latent_dim"]))
    out, _ = staged_forward(
        params, state, z, cond, jax.random.PRNGKey(0), config,
        truncation_psi=config.get("truncation_psi", 0.7), avg_latent=avg_latent)
    return out["rgbs"][0]  # (H, W, 3) in [-1, 1]


def main():
    opt = parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)

    from threedhumangan_tpu import configs
    from threedhumangan_tpu.data import get_dataset, get_preprocessor
    from threedhumangan_tpu.models.generator import generate_avg_latent, init_generator
    from threedhumangan_tpu.utils.fid import (
        compute_statistics,
        frechet_distance,
        get_extractor,
    )

    config = configs.get_config(opt)
    config = {k: v for k, v in config.items() if isinstance(k, str)}
    # reference eval settings (ref apps/sample_from_generator.py:94-99)
    config.update(truncation_psi=0.7, v_stddev=0, h_stddev=0, nerf_noise=0,
                  perturb_rays=False, dataroot=opt.dataroot,
                  dataset_length=opt.dataset_length)
    config["last_back"] = config.get("eval_last_back", False)

    summary = {"config": config["name"], "n_seeds": len(opt.seeds)}

    key = jax.random.PRNGKey(0)
    params, state = init_generator(key, config)
    if opt.torch_checkpoint and os.path.exists(opt.torch_checkpoint):
        from threedhumangan_tpu.utils.torch_convert import (
            convert_generator_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(opt.torch_checkpoint)
        params, state = convert_generator_state_dict(sd, config)
        summary["weights"] = "released-checkpoint"
    else:
        summary["weights"] = "random-init (no --torch_checkpoint): synthetic mode"

    avg_latent = generate_avg_latent(params, jax.random.PRNGKey(1), config)
    loader, dataset = get_dataset(config["dataset"], inference=True, **config)
    preprocessor = get_preprocessor(config, smpl_model=dataset.smpl_model)

    # fixed pose per seed: dataset item (seed % len) — deterministic
    renders = {}
    for seed in opt.seeds:
        data = dataset[seed % len(dataset)]
        conditions = {k: jnp.asarray(np.asarray(v)[None]) for k, v in data.items()}
        img = np.asarray(
            render_seed(params, state, preprocessor, config, seed, conditions,
                        avg_latent), np.float32)
        renders[seed] = img

    os.makedirs(opt.output_dir, exist_ok=True)
    if opt.write_goldens:
        os.makedirs(opt.write_goldens, exist_ok=True)
        for seed, img in renders.items():
            np.save(os.path.join(opt.write_goldens, f"seed_{seed:03d}.npy"), img)
        summary["goldens_written"] = opt.write_goldens

    if opt.goldens and os.path.isdir(opt.goldens):
        deltas = {}
        golden_imgs, our_imgs = [], []
        for seed, img in renders.items():
            path = os.path.join(opt.goldens, f"seed_{seed:03d}.npy")
            if not os.path.exists(path):
                continue
            g = np.load(path).astype(np.float32)
            if g.shape != img.shape:
                deltas[seed] = {"error": f"shape {g.shape} vs {img.shape}"}
                continue
            deltas[seed] = {
                "max_abs": float(np.abs(g - img).max()),
                "mean_abs": float(np.abs(g - img).mean()),
            }
            golden_imgs.append(g)
            our_imgs.append(img)
        summary["per_pixel"] = deltas
        if len(golden_imgs) >= 2:
            feats_fn, label = get_extractor("auto")
            feats_fn = jax.jit(feats_fn)
            fa = np.asarray(feats_fn(jnp.asarray(np.stack(our_imgs))))
            fb = np.asarray(feats_fn(jnp.asarray(np.stack(golden_imgs))))
            summary["feature_frechet"] = frechet_distance(
                *compute_statistics(fa), *compute_statistics(fb))
            summary["feature_space"] = label
    elif opt.goldens:
        summary["per_pixel"] = f"goldens dir not found: {opt.goldens}"

    with open(os.path.join(opt.output_dir, "parity.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    code = main()
    sys.stdout.flush()
    os._exit(code)  # axon plugin aborts in C++ teardown after platform switch
