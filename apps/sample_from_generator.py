"""Inference CLI: render one identity across a sweep of camera angles.

CLI parity with reference ``apps/sample_from_generator.py`` (:70-151):
same flags, same outputs (mp4/gif/png of the synthesis + the rasterized
SMPL semantics), same eval settings (truncation_psi=0.7, h/v_stddev=0,
nerf_noise=0, last_back=eval_last_back; ref :94-99).

TPU-first: the per-angle loop is jit-compiled once and reused across angles
and seeds (the reference re-enters Python per frame, ref :48-59).
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.getcwd())

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="MAP3DBN")
    parser.add_argument("--tune", type=str, default="")
    parser.add_argument("--variant", type=int, default=0)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--seeds", nargs="+", type=int, default=list(range(1, 10)))
    parser.add_argument("--dataroot", type=str, default="./datasets/shhq_example_dataset")
    parser.add_argument("--dataset_length", type=int, default=10)
    parser.add_argument("--output_dir", type=str, default="results/sample_from_generator")
    parser.add_argument("--postfix", type=str, default="")
    parser.add_argument("--lock_view_dependence", default=None)
    parser.add_argument("--n_angles", type=int, default=40)
    parser.add_argument("--back_and_forth", default=False, action="store_true")
    parser.add_argument("--save", type=str, default="mp4", choices=["mp4", "png", "gif"])
    parser.add_argument("--stitch", default=False, action="store_true")
    parser.add_argument("--platform", type=str, default=None)
    return parser.parse_args()


def generate_frames(params, state, preprocessor, config, seed, conditions,
                    n_angles, angle_range_h, angle_range_v, back_and_forth,
                    avg_latent):
    """(ref generate_frames :24-67)"""
    import jax
    import jax.numpy as jnp

    from threedhumangan_tpu.models.generator import staged_forward

    key = jax.random.PRNGKey(seed)
    k_z, k_frames = jax.random.split(key)
    z = jax.random.normal(k_z, (1, config["latent_dim"]))

    if back_and_forth:
        t = jnp.linspace(-np.pi, np.pi, n_angles)
        angles_h = angle_range_h * jnp.sin(t)
        angles_v = angle_range_v * jnp.cos(t)
    else:
        angles_h = jnp.linspace(-angle_range_h, angle_range_h, n_angles)
        angles_v = jnp.linspace(-angle_range_v, angle_range_v, n_angles)

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def one_frame(h, v, rng):
        cond = preprocessor.forward_with_rotation(
            conditions, h[None], v[None], jnp.zeros((1,)))
        out, _ = staged_forward(params, state, z, cond, rng, config,
                                truncation_psi=config.get("truncation_psi", 0.7),
                                avg_latent=avg_latent)
        smpl_img = jnp.clip(cond["rasterized_semantics"], -1, 1)
        bg = jnp.all(smpl_img == 0, axis=-1, keepdims=True)
        smpl_img = jnp.where(bg, 1.0, smpl_img)
        frame = jnp.clip(out["rgbs"], -1, 1)
        return frame[0], smpl_img[0]

    frames, semantics = [], []
    keys = jax.random.split(k_frames, n_angles)
    for i in range(n_angles):
        f, s = one_frame(angles_h[i], angles_v[i], keys[i])
        frames.append(np.asarray(f))
        semantics.append(np.asarray(s))

    frames = np.stack(frames) * 0.5 + 0.5
    frames = np.clip(frames * 255, 0, 255).astype(np.uint8)
    semantics = np.stack(semantics) * 0.5 + 0.5
    semantics = np.clip(semantics * 255, 0, 255).astype(np.uint8)
    return frames, semantics


def main():
    opt = parse_args()

    import jax
    import jax.numpy as jnp

    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)

    from threedhumangan_tpu import configs
    from threedhumangan_tpu.data import get_dataset, get_preprocessor
    from threedhumangan_tpu.models.generator import generate_avg_latent, init_generator
    from threedhumangan_tpu.utils.checkpoint import load_checkpoint

    config = configs.get_config(opt)
    config = {k: v for k, v in config.items() if isinstance(k, str)}

    # eval settings (ref :94-99)
    config["truncation_psi"] = 0.7
    config["v_stddev"] = 0
    config["h_stddev"] = 0
    if opt.lock_view_dependence is not None:
        config["lock_view_dependence"] = opt.lock_view_dependence
    config["last_back"] = config.get("eval_last_back", False)
    config["nerf_noise"] = 0
    config["perturb_rays"] = False
    config["dataroot"] = opt.dataroot
    config["dataset_length"] = opt.dataset_length

    output_dir = os.path.join(opt.output_dir, config["name"] + opt.postfix)
    os.makedirs(output_dir, exist_ok=True)

    # model
    key = jax.random.PRNGKey(0)
    params, state = init_generator(key, config)
    if opt.checkpoint and os.path.exists(opt.checkpoint):
        payload = load_checkpoint(opt.checkpoint)
        if "train_state" in payload:  # our checkpoint: use the EMA params
            params = jax.tree.map(jnp.asarray, payload["train_state"]["ema"]["params"])
            state = jax.tree.map(jnp.asarray, payload["train_state"]["state_G"])
        else:
            params = jax.tree.map(jnp.asarray, payload["params"])
            state = jax.tree.map(jnp.asarray, payload.get("state", state))

    avg_latent = generate_avg_latent(params, jax.random.PRNGKey(1), config)

    loader, dataset = get_dataset(config["dataset"], inference=True, **config)
    preprocessor = get_preprocessor(config, smpl_model=dataset.smpl_model)
    data_iter = iter(loader())

    try:
        import imageio
    except ImportError:
        imageio = None

    for seed in opt.seeds:
        data = next(data_iter)
        conditions = {k: jnp.asarray(v) for k, v in data.items()}
        frames, semantics = generate_frames(
            params, state, preprocessor, config, seed, conditions,
            opt.n_angles, math.pi / 6, 0, opt.back_and_forth, avg_latent)

        if opt.stitch:
            frames = np.concatenate([frames, semantics], axis=1)

        base = os.path.join(output_dir, f"{seed:03d}")
        if imageio is None or opt.save == "png":
            # always-available fallback: PNG strip
            from PIL import Image

            Image.fromarray(np.concatenate(list(frames), axis=1)).save(base + "_uncond.png")
            Image.fromarray(np.concatenate(list(semantics), axis=1)).save(base + "_smpl.png")
        elif opt.save == "gif":
            imageio.mimwrite(base + "_uncond.gif", frames, fps=10)
            imageio.mimwrite(base + "_smpl.gif", semantics, fps=10)
        else:
            imageio.mimwrite(base + "_uncond.mp4", frames, fps=20, quality=9)
            if not opt.stitch:
                imageio.mimwrite(base + "_smpl.mp4", semantics, fps=20, quality=9)
        print(f"seed {seed}: wrote {base}_*.{opt.save}")


if __name__ == "__main__":
    main()
    # skip interpreter finalization (axon plugin teardown aborts after a
    # platform switch; see apps/train.py)
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
