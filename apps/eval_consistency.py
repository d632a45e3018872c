"""Multi-view consistency sweep (BASELINE.json config #2).

Renders ONE identity across N camera angles / body poses and reports
cross-view consistency metrics:
  * seg_iou   — mean IoU between the generator's rendered body silhouette
                (from the depth/weights) and the rasterized SMPL silhouette,
                per view (geometric grounding of the 3D representation);
  * photo_l1  — mean L1 between adjacent-view images warped only by the
                small camera delta (a cheap view-consistency proxy; true
                multi-view metrics need correspondences).

Usage:
  python apps/eval_consistency.py --config MAP3DBN_TINY --n_angles 16
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
    parser.add_argument("--n_angles", type=int, default=16)
    parser.add_argument("--angle_range", type=float, default=np.pi / 6)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--platform", type=str, default=None)
    opt = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)

    from threedhumangan_tpu import configs
    from threedhumangan_tpu.data import get_dataset, get_preprocessor
    from threedhumangan_tpu.models.generator import init_generator, staged_forward
    from threedhumangan_tpu.utils.checkpoint import load_checkpoint

    config = configs.get_config(opt)
    config = {k: v for k, v in config.items() if isinstance(k, str)}
    config["truncation_psi"] = 0.7
    config["h_stddev"] = config["v_stddev"] = 0
    config["nerf_noise"] = 0
    config["perturb_rays"] = False
    config["last_back"] = config.get("eval_last_back", False)

    key = jax.random.PRNGKey(opt.seed)
    params, state = init_generator(key, config)
    if opt.checkpoint and os.path.exists(opt.checkpoint):
        payload = load_checkpoint(opt.checkpoint)
        params = jax.tree.map(jnp.asarray, payload["train_state"]["ema"]["params"])
        state = jax.tree.map(jnp.asarray, payload["train_state"]["state_G"])

    loader, dataset = get_dataset(config["dataset"], inference=True, **config)
    pre = get_preprocessor(config, smpl_model=dataset.smpl_model)
    data = next(iter(loader()))
    conditions = {k: jnp.asarray(v) for k, v in data.items()}

    z = jax.random.normal(key, (1, config["latent_dim"]))
    angles = np.linspace(-opt.angle_range, opt.angle_range, opt.n_angles)

    import functools

    @functools.partial(jax.jit)
    def one_view(h, rng):
        cond = pre.forward_with_rotation(
            conditions, jnp.asarray([h]), jnp.zeros((1,)), jnp.zeros((1,)))
        out, _ = staged_forward(params, state, z, cond, rng, config)
        body_mask = cond["rasterized_segments"] > 1  # (1, H, W)
        # silhouette from depth: rendered foreground where depth < +1 clamp
        depth = out["depths"][..., 0]  # (1, h, w)
        render_mask = depth < 0.999
        raster_small = jax.image.resize(
            body_mask.astype(jnp.float32), depth.shape, method="nearest") > 0.5
        inter = jnp.sum(render_mask & raster_small)
        union = jnp.sum(render_mask | raster_small)
        iou = inter / jnp.maximum(union, 1)
        return out["rgbs"][0], iou

    keys = jax.random.split(key, opt.n_angles)
    frames, ious = [], []
    for i, h in enumerate(angles):
        frame, iou = one_view(float(h), keys[i])
        frames.append(np.asarray(frame))
        ious.append(float(iou))

    frames = np.stack(frames)
    adj_l1 = float(np.mean(np.abs(frames[1:] - frames[:-1])))

    result = {
        "metric": "multi-view consistency (16-angle sweep)",
        "n_angles": opt.n_angles,
        "seg_iou_mean": round(float(np.mean(ious)), 4),
        "adjacent_view_l1": round(adj_l1, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
    # skip interpreter finalization (axon plugin teardown aborts after a
    # platform switch; see apps/train.py)
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
