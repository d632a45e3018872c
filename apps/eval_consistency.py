"""Multi-view consistency sweep (BASELINE.json config #2).

Renders ONE identity across N camera angles / body poses and reports
cross-view consistency metrics:
  * seg_iou    — mean IoU between the generator's rendered body silhouette
                 (from the depth/weights) and the rasterized SMPL silhouette,
                 per view (geometric grounding of the 3D representation);
  * reproj_l1  — depth-REPROJECTION consistency: view i's pixels are lifted
                 to world space through the rendered depth and the
                 weak-perspective camera (volume_rendering.py
                 get_initial_rays_weak_perspective inverse), projected into
                 view i+1, and the bilinearly-sampled neighbor image is
                 compared under the joint validity mask.  This is the real
                 multi-view metric — geometry and appearance must agree;
  * adjacent_view_l1 — raw un-warped adjacent-frame L1 (legacy proxy, kept
                 for cross-round comparability).

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

    rh, rw = config["render_height"], config["render_width"]

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
        # render-res image for the reprojection metric
        rgb_small = jax.image.resize(out["rgbs"], (1, rh, rw, 3), "bilinear")
        focal = cond["intrinsics"][0, 0, 0]
        scale = cond["scales"][0].astype(jnp.float32)
        return (out["rgbs"][0], iou, out["depths"][0, ..., 0], rgb_small[0],
                cond["cam2world_matrices"][0], focal, scale)

    @functools.partial(jax.jit)
    def reproject(depth_i, rgb_i, cam_i, rgb_j, cam_j, focal, scale):
        """Lift view i through its rendered depth, project into view j,
        sample view j's image, masked L1.  Exact inverse of the
        weak-perspective ray model (volume_rendering.py:102-136): pixel
        (u, v) -> d_cam = normalize([x, y, focal]), world = R d t + T with
        depth t measured along the normalized ray."""
        span = rw / rh
        xs = jnp.linspace(-span, span, rw)
        ys = jnp.linspace(-1.0, 1.0, rh)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")            # (rh, rw)
        d_cam = jnp.stack([gx, gy, jnp.full_like(gx, focal)], -1)
        d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
        # un-normalize the [-1, 1]-clipped depth map (staged_forward output)
        t = depth_i * (config["depth_length"] / 2.0) + focal / scale
        p = jnp.einsum("ij,hwj->hwi", cam_i[:3, :3], d_cam * t[..., None])
        p = p + cam_i[:3, 3]
        # world -> view j camera space -> weak-perspective pixel
        q = jnp.einsum("ji,hwj->hwi", cam_j[:3, :3], p - cam_j[:3, 3])
        xj = q[..., 0] / q[..., 2] * focal
        yj = q[..., 1] / q[..., 2] * focal
        grid = jnp.stack([xj / span, yj], -1)[None]             # (1,rh,rw,2)
        from threedhumangan_tpu.ops import grid_sample

        warped = grid_sample(rgb_j[None], grid)[0]
        valid = ((jnp.abs(depth_i) < 0.999)
                 & (jnp.abs(xj) < span) & (jnp.abs(yj) < 1.0))
        err = jnp.sum(jnp.abs(warped - rgb_i), axis=-1) / 3.0
        n = jnp.maximum(jnp.sum(valid), 1)
        return jnp.sum(jnp.where(valid, err, 0.0)) / n, n

    keys = jax.random.split(key, opt.n_angles)
    frames, ious, views = [], [], []
    for i, h in enumerate(angles):
        frame, iou, depth, rgb_small, cam, focal, scale = one_view(float(h), keys[i])
        frames.append(np.asarray(frame))
        ious.append(float(iou))
        views.append((depth, rgb_small, cam, focal, scale))

    reproj, weights = [], []
    for i in range(len(views) - 1):
        d_i, rgb_i, cam_i, focal, scale = views[i]
        _, rgb_j, cam_j, _, _ = views[i + 1]
        l1, n = reproject(d_i, rgb_i, cam_i, rgb_j, cam_j, focal, scale)
        reproj.append(float(l1))
        weights.append(float(n))

    frames = np.stack(frames)
    adj_l1 = float(np.mean(np.abs(frames[1:] - frames[:-1])))
    reproj_l1 = float(np.average(reproj, weights=weights))

    result = {
        "metric": "multi-view consistency (16-angle sweep)",
        "n_angles": opt.n_angles,
        "seg_iou_mean": round(float(np.mean(ious)), 4),
        "reproj_l1": round(reproj_l1, 4),
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
