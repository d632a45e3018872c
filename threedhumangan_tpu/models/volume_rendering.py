"""Ray generation, camera sampling and NeRF-style volume integration.

Behavioural parity with reference ``lib/generators/volume_rendering.py``:
  ray_integration                     (ref :12-56)
  get_initial_rays_weak_perspective   (ref :86-110)
  perturb_points                      (ref :124-130)
  transform_sampled_points            (ref :133-170)
  sample_camera_positions             (ref :182-230)
  create_cam2world_matrix             (ref :232-250)
  sample_pdf                          (ref :261-303)

TPU-first notes: everything is a pure function of arrays + an explicit PRNG
key; the integration cumprod runs along the (small, static) step axis so XLA
unrolls it; points tensors are (B, rays, steps, 3) with rays = H*W kept as a
single flattened axis that downstream matmuls tile onto the MXU.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from threedhumangan_tpu.utils.misc import normalize_vecs


def ray_integration(
    field_out: jax.Array,
    z_vals: jax.Array,
    *,
    noise_std: float = 0.5,
    rng: Optional[jax.Array] = None,
    last_back: bool = False,
    white_back: bool = False,
    clamp_mode: str = "relu",
    fill_mode: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Alpha-composite per-ray samples (ref volume_rendering.py:12-56).

    Args:
      field_out: (B, rays, steps, C+1) — features ++ sigma in the last slot.
      z_vals:    (B, rays, steps, 1)
    Returns:
      (features_final (B,rays,C), depth (B,rays,1), weights (B,rays,steps,1))
    """
    features = field_out[..., :-1]
    sigmas = field_out[..., -1:]

    deltas = z_vals[:, :, 1:] - z_vals[:, :, :-1]
    delta_inf = 1e9 * jnp.ones_like(deltas[:, :, :1])
    deltas = jnp.concatenate([deltas, delta_inf], axis=-2)

    # noise_std may be a traced scalar (decays per training step,
    # base_trainer.py:384) — branch only on the static rng presence.
    if rng is not None:
        sigmas = sigmas + noise_std * jax.random.normal(rng, sigmas.shape, sigmas.dtype)

    if clamp_mode == "softplus":
        density = jax.nn.softplus(sigmas)
    elif clamp_mode == "relu":
        density = jax.nn.relu(sigmas)
    else:
        raise ValueError("clamp_mode must be 'relu' or 'softplus'")

    alphas = 1.0 - jnp.exp(-deltas * density)
    alphas_shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :, :1]), 1.0 - alphas + 1e-12], axis=-2
    )
    transmittance = jnp.cumprod(alphas_shifted, axis=-2)[:, :, :-1]
    weights = alphas * transmittance
    weights_sum = jnp.sum(weights, axis=2)

    if last_back:
        w_last = weights[:, :, -1:] + (1.0 - weights_sum)[:, :, None]
        weights = jnp.concatenate([weights[:, :, :-1], w_last], axis=-2)
        features_final = jnp.sum(weights * features, axis=-2)
        depth_final = jnp.sum(weights * z_vals, axis=-2)
    else:
        features_final = jnp.sum(weights * features, axis=-2)
        w_last = weights[:, :, -1:] + (1.0 - weights_sum)[:, :, None]
        weights_depth = jnp.concatenate([weights[:, :, :-1], w_last], axis=-2)
        depth_final = jnp.sum(weights_depth * z_vals, axis=-2)

    if white_back:
        features_final = features_final + 1.0 - weights_sum

    if fill_mode == "debug":
        # paint low-opacity rays red (ref volume_rendering.py:49-51); only
        # the first 3 channels carry the debug color, matching the
        # reference's 3-channel assignment
        red = jnp.zeros_like(features_final).at[..., 0].set(1.0)
        hollow = weights_sum < 0.9
        features_final = jnp.where(hollow, red, features_final)
    elif fill_mode == "weight":
        features_final = jnp.broadcast_to(weights_sum, features_final.shape)

    return features_final, depth_final, weights


def get_initial_rays_weak_perspective(
    focals: jax.Array,
    scales: jax.Array,
    num_steps: int,
    resolution: Tuple[int, int],
    ray_start: float,
    ray_end: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Camera-space rays for a weak-perspective camera (ref :86-110).

    Pixel order is row-major over (H, W); x spans ±W/H, y spans ±1.
    z_vals are distances along the *normalized* ray, offset by focal/scale
    so the sampling interval brackets the body.
    """
    W, H = resolution
    batch_size = focals.shape[0]
    span = W / H

    xs = jnp.linspace(-span, span, W, dtype=jnp.float32)
    ys = jnp.linspace(-1.0, 1.0, H, dtype=jnp.float32)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)
    x = jnp.broadcast_to(grid_x.reshape(1, H * W), (batch_size, H * W))
    y = jnp.broadcast_to(grid_y.reshape(1, H * W), (batch_size, H * W))
    z = jnp.broadcast_to(focals[:, None], (batch_size, H * W)).astype(jnp.float32)

    rays_d_cam = normalize_vecs(jnp.stack([x, y, z], axis=-1))  # (B, HW, 3)

    z_vals = jnp.linspace(ray_start, ray_end, num_steps, dtype=jnp.float32)
    z_vals = jnp.broadcast_to(
        z_vals.reshape(1, 1, num_steps, 1), (batch_size, H * W, num_steps, 1)
    )
    z_vals = z_vals + (focals / scales).reshape(batch_size, 1, 1, 1)

    points = rays_d_cam[:, :, None, :] * z_vals
    return points, z_vals, rays_d_cam


def get_initial_rays_trig(
    n: int,
    num_steps: int,
    fov: float,
    resolution: Tuple[int, int],
    ray_start: float,
    ray_end: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pinhole-camera rays from a field of view in degrees (ref :60-83).

    Part of the public surface (dead in the reference live path — the live
    model uses the weak-perspective variant).  Returns
    (points (n, W*H, steps, 3), z_vals (n, W*H, steps, 1), rays_d_cam).
    """
    import math

    W, H = resolution
    span = W / H
    xs = jnp.linspace(-span, span, W, dtype=jnp.float32)
    ys = jnp.linspace(-1.0, 1.0, H, dtype=jnp.float32)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)
    x = grid_x.reshape(-1)
    y = grid_y.reshape(-1)
    focal = 1.0 / math.tan(math.pi * (fov / 180.0) / 2.0)
    z = jnp.full_like(x, focal)

    rays_d_cam = normalize_vecs(jnp.stack([x, y, z], axis=-1))  # (W*H, 3)

    z_vals = jnp.linspace(ray_start, ray_end, num_steps, dtype=jnp.float32)
    z_vals = jnp.broadcast_to(z_vals.reshape(1, num_steps, 1), (W * H, num_steps, 1))
    points = rays_d_cam[:, None, :] * z_vals

    points = jnp.broadcast_to(points[None], (n,) + points.shape)
    z_vals = jnp.broadcast_to(z_vals[None], (n,) + z_vals.shape)
    rays_d_cam = jnp.broadcast_to(rays_d_cam[None], (n,) + rays_d_cam.shape)
    return points, z_vals, rays_d_cam


def expand_ray_directions(ray_directions: jax.Array, num_steps: int) -> jax.Array:
    """(B, rays, 3) -> (B, rays*steps, 3) (ref :113-121)."""
    B, R, _ = ray_directions.shape
    out = jnp.broadcast_to(ray_directions[:, :, None, :], (B, R, num_steps, 3))
    return out.reshape(B, R * num_steps, 3)


def perturb_points(points, z_vals, ray_directions, rng):
    """Uniform per-sample jitter within one step interval (ref :124-130)."""
    dist = z_vals[:, :, 1:2, :] - z_vals[:, :, 0:1, :]
    offset = (jax.random.uniform(rng, z_vals.shape, z_vals.dtype) - 0.5) * dist
    z_vals = z_vals + offset
    points = points + offset * ray_directions[:, :, None, :]
    return points, z_vals


def _truncated_normal(rng, shape):
    return jax.random.truncated_normal(rng, -2.0, 2.0, shape)


def sample_camera_positions(
    rng: jax.Array,
    n: int = 1,
    r: float = 1.0,
    horizontal_stddev: float = 1.0,
    vertical_stddev: float = 1.0,
    horizontal_mean: float = math.pi * 0.5,
    vertical_mean: float = math.pi * 0.5,
    mode: str = "normal",
):
    """Sample camera positions on a sphere (ref :182-230).

    theta = yaw, phi = pitch.  The 'hybrid' mode's python-level coin flip is
    replaced by a traced jnp.where so the function stays jittable.
    """
    k1, k2, k3 = jax.random.split(rng, 3)

    if mode == "uniform":
        theta = (jax.random.uniform(k1, (n, 1)) - 0.5) * 2 * horizontal_stddev + horizontal_mean
        phi = (jax.random.uniform(k2, (n, 1)) - 0.5) * 2 * vertical_stddev + vertical_mean
    elif mode in ("normal", "gaussian"):
        theta = jax.random.normal(k1, (n, 1)) * horizontal_stddev + horizontal_mean
        phi = jax.random.normal(k2, (n, 1)) * vertical_stddev + vertical_mean
    elif mode == "hybrid":
        coin = jax.random.uniform(k3, ()) < 0.5
        theta_u = (jax.random.uniform(k1, (n, 1)) - 0.5) * 4 * horizontal_stddev + horizontal_mean
        phi_u = (jax.random.uniform(k2, (n, 1)) - 0.5) * 4 * vertical_stddev + vertical_mean
        theta_n = jax.random.normal(k1, (n, 1)) * horizontal_stddev + horizontal_mean
        phi_n = jax.random.normal(k2, (n, 1)) * vertical_stddev + vertical_mean
        theta = jnp.where(coin, theta_u, theta_n)
        phi = jnp.where(coin, phi_u, phi_n)
    elif mode == "truncated_gaussian":
        theta = _truncated_normal(k1, (n, 1)) * horizontal_stddev + horizontal_mean
        phi = _truncated_normal(k2, (n, 1)) * vertical_stddev + vertical_mean
    elif mode == "spherical_uniform":
        theta = (2.0 * jax.random.uniform(k1, (n, 1)) - 1.0) * horizontal_stddev + horizontal_mean
        v_stddev, v_mean = vertical_stddev / math.pi, vertical_mean / math.pi
        v = (2.0 * jax.random.uniform(k2, (n, 1)) - 1.0) * v_stddev + v_mean
        v = jnp.clip(v, 1e-5, 1 - 1e-5)
        phi = jnp.arccos(1 - 2 * v)
    else:
        theta = jnp.full((n, 1), horizontal_mean, jnp.float32)
        phi = jnp.full((n, 1), vertical_mean, jnp.float32)

    phi = jnp.clip(phi, 1e-5, math.pi - 1e-5)
    origin = jnp.concatenate(
        [
            r * jnp.sin(phi) * jnp.cos(theta),
            r * jnp.cos(phi),
            r * jnp.sin(phi) * jnp.sin(theta),
        ],
        axis=-1,
    )
    return origin, phi, theta


def create_cam2world_matrix(forward_vector: jax.Array, origin: jax.Array) -> jax.Array:
    """Look-at cam2world (ref :232-250); y-up."""
    forward_vector = normalize_vecs(forward_vector)
    up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], forward_vector.dtype), forward_vector.shape)
    left = normalize_vecs(jnp.cross(up, forward_vector))
    up = normalize_vecs(jnp.cross(forward_vector, left))

    rotation = jnp.stack([left, up, forward_vector], axis=-1)  # (B, 3, 3)
    B = forward_vector.shape[0]
    cam2world = jnp.tile(jnp.eye(4, dtype=forward_vector.dtype)[None], (B, 1, 1))
    cam2world = cam2world.at[:, :3, :3].set(rotation)
    cam2world = cam2world.at[:, :3, 3].set(origin)
    return cam2world


def transform_sampled_points(
    points: jax.Array,
    z_vals: jax.Array,
    ray_directions: jax.Array,
    rng: jax.Array,
    cam2world_matrix: Optional[jax.Array] = None,
    h_stddev: float = 1.0,
    v_stddev: float = 1.0,
    h_mean: float = math.pi * 0.5,
    v_mean: float = math.pi * 0.5,
    mode: Optional[str] = "normal",
    cano_matrices: Optional[jax.Array] = None,
    perturb: bool = True,
):
    """Jitter samples, pick a camera, map camera space to world (ref :133-170)."""
    B, R, S, _ = points.shape
    k_perturb, k_cam = jax.random.split(rng)

    if perturb:
        points, z_vals = perturb_points(points, z_vals, ray_directions, k_perturb)

    origin, pitch, yaw = sample_camera_positions(
        k_cam, n=B, r=1.0,
        horizontal_stddev=h_stddev, vertical_stddev=v_stddev,
        horizontal_mean=h_mean, vertical_mean=v_mean,
        mode=mode if mode is not None else "none",
    )
    if cam2world_matrix is None:
        forward = normalize_vecs(-origin)
        cam2world_matrix = create_cam2world_matrix(forward, origin)
    cam2world_matrix = cam2world_matrix.astype(jnp.float32)
    world2cam_matrix = jnp.linalg.inv(cam2world_matrix)

    compose = cam2world_matrix
    if cano_matrices is not None:
        compose = jnp.einsum("bij,bjk->bik", cano_matrices.astype(jnp.float32), compose)

    pts = points.reshape(B, R * S, 3)
    transformed_points = jnp.einsum("bij,bnj->bni", compose[:, :3, :3], pts) + compose[:, None, :3, 3]
    transformed_points = transformed_points.reshape(B, R, S, 3)

    transformed_ray_directions = jnp.einsum(
        "bij,bnj->bni", compose[:, :3, :3], ray_directions
    )
    origins = jnp.broadcast_to(compose[:, None, :3, 3], (B, R, 3))

    return (
        transformed_points,
        z_vals,
        transformed_ray_directions,
        origins,
        pitch,
        yaw,
        world2cam_matrix,
    )


def sample_pdf(
    bins: jax.Array,
    weights: jax.Array,
    n_importance: int,
    rng: Optional[jax.Array] = None,
    det: bool = False,
    eps: float = 1e-5,
) -> jax.Array:
    """Inverse-CDF importance sampling for hierarchical NeRF (ref :261-303).

    bins: (N_rays, M+1), weights: (N_rays, M) -> samples (N_rays, n_importance)
    """
    n_rays, n_samples = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (N, M+1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_importance)
        u = jnp.broadcast_to(u, (n_rays, n_importance))
    else:
        u = jax.random.uniform(rng, (n_rays, n_importance))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, n_samples)

    cdf_below = jnp.take_along_axis(cdf, below, axis=1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=1)
    bins_below = jnp.take_along_axis(bins, below, axis=1)
    bins_above = jnp.take_along_axis(bins, above, axis=1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < eps, 1.0, denom)
    samples = bins_below + (u - cdf_below) / denom * (bins_above - bins_below)
    return samples
