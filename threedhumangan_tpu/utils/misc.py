"""Small math / init / precision utilities.

Replaces the reference's ``lib/components/util.py`` (normalize_2nd_moment at
util.py:58-59, normalize_vecs at :87-91, positional_encoding at :32-45,
apply_transformation at :62-84) with pure-JAX equivalents, plus the
mixed-precision policy the TPU build uses instead of AMP + GradScaler.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# precision policy
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Policy:
    """Mixed-precision policy: params live in ``param_dtype``, activations in
    ``compute_dtype``, accumulation always float32 (``preferred_element_type``).

    The reference uses torch AMP autocast + GradScaler
    (base_trainer.py:50-51); on TPU bf16 has the same exponent range as f32
    so no loss scaling is needed.
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32

    def cast(self, x):
        return jax.tree.map(
            lambda a: a.astype(self.compute_dtype)
            if isinstance(a, jax.Array) and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            x,
        )


def policy_from_meta(meta: dict) -> Policy:
    if meta.get("use_mixed_precision", False):
        return Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)
    return Policy()


# ---------------------------------------------------------------------------
# math
# ---------------------------------------------------------------------------


def normalize_2nd_moment(x: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    """x * rsqrt(mean(x^2) + eps) along ``axis`` (reference util.py:58-59,
    whose default dim=1 is the channel axis of a (B, C) tensor == -1 here)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


def normalize_vecs(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Unit-normalize along the last axis (reference util.py:87-91)."""
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)


def apply_transformation(points: jax.Array, transform: jax.Array) -> jax.Array:
    """Apply homogeneous 4x4 transforms to (..., 3) points.

    ``transform`` broadcasts against the leading dims of ``points``
    (reference util.py:62-84).
    """
    homo = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    out = jnp.einsum("...ij,...j->...i", transform, homo)
    return out[..., :3]


def positional_encoding(x: jax.Array, L: int = 10) -> jax.Array:
    """NeRF-style sin/cos encoding along the last axis (reference
    util.py:32-45; frequencies are pi * (1..L))."""
    freqs = math.pi * jnp.arange(1, L + 1, dtype=x.dtype)
    xb = x[..., None, :] * freqs[:, None]  # (..., L, C)
    xb = xb.reshape(*x.shape[:-1], L * x.shape[-1])
    return jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)


def perspective_projection(points: jax.Array, intrinsics: jax.Array,
                           extrinsics: jax.Array) -> jax.Array:
    """Project world points through extrinsics + intrinsics (reference
    util.py:94-106; dead in the reference live path, public surface).

    Args:
      points: (B, N, 3); intrinsics: (B, 3, 3); extrinsics: (B, 4, 4).
    Returns:
      (B, N, 3) — xy perspective-divided, z kept.
    """
    cam = apply_transformation(points, extrinsics[:, None])
    projected = jnp.einsum("bij,bnj->bni", intrinsics, cam)
    xy = projected[..., :2] / (projected[..., 2:3] + 1e-12)
    return jnp.concatenate([xy, projected[..., 2:3]], axis=-1)


def skeleton_uvd_to_heatmap(uv: jax.Array, resolution, depth=None,
                            sigma: float = 0.06) -> jax.Array:
    """Gaussian joint heatmaps from normalized uv coords (reference
    util.py:109-138).  Returns (B, J, H, W) in [0, 1], or (B, J, 2, H, W)
    when ``depth`` (B, J) rides along."""
    B, J, _ = uv.shape
    width, height = resolution
    span = width / height
    gx = jnp.linspace(-span, span, width, dtype=uv.dtype)
    gy = jnp.linspace(-1.0, 1.0, height, dtype=uv.dtype)
    grid_y, grid_x = jnp.meshgrid(gy, gx, indexing="ij")  # (H, W)

    dx = grid_x[None, None] - uv[:, :, 0, None, None]
    dy = grid_y[None, None] - uv[:, :, 1, None, None]
    heatmaps = jnp.exp(-0.5 * (dx * dx + dy * dy) / (sigma * sigma))

    if depth is not None:
        d = jnp.clip(depth, -1.0, 1.0)[:, :, None, None]
        d = jnp.broadcast_to(d, heatmaps.shape)
        heatmaps = jnp.stack([heatmaps, d], axis=2)
    return heatmaps


def visualize_heatmap(skeleton_uvd: jax.Array, resolution,
                      depth_length: float) -> jax.Array:
    """Depth-colored skeleton heatmap visualization (reference
    util.py:141-156).  Returns (B, 3, H, W)."""
    B, J, _ = skeleton_uvd.shape
    depth = skeleton_uvd[..., 2:3] / (depth_length / 2.0)
    heatmap = skeleton_uvd_to_heatmap(skeleton_uvd[..., :2], resolution)
    base = 0.5 * math.pi
    red = jnp.sin(base * depth) + 1.0
    green = jnp.sin(-base * depth) + 1.0
    blue = 0.5 * jnp.cos(base * depth) + 0.5
    color = jnp.stack([red, green, blue], axis=2).reshape(B, J, 3, 1, 1)
    return jnp.max(color * heatmap[:, :, None], axis=1)


# ---------------------------------------------------------------------------
# initializers  (semantics of lib/components/pigan_layers.py:17-60 and
# torch.nn.init.kaiming_normal_, expressed as explicit samplers)
# ---------------------------------------------------------------------------


def uniform_init(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def lecun_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = math.sqrt(1.0 / fan_in)
    return uniform_init(key, shape, bound, dtype)


def kaiming_normal_leaky(key, shape, fan_in, a: float = 0.2, dtype=jnp.float32):
    """torch kaiming_normal_(mode='fan_in', nonlinearity='leaky_relu')."""
    gain = math.sqrt(2.0 / (1.0 + a * a))
    std = gain / math.sqrt(fan_in)
    return std * jax.random.normal(key, shape, dtype)


def kaiming_normal_linear(key, shape, fan_in, dtype=jnp.float32):
    """torch kaiming_normal_(mode='fan_in', nonlinearity='linear')."""
    std = 1.0 / math.sqrt(fan_in)
    return std * jax.random.normal(key, shape, dtype)


def frequency_init_bound(fan_in: int, freq: float) -> float:
    """pi-GAN frequency init bound: sqrt(6/fan_in)/freq (pigan_layers.py:45-51)."""
    return math.sqrt(6.0 / fan_in) / freq


def first_layer_sine_bound(fan_in: int) -> float:
    """First SIREN layer init bound: 1/fan_in (pigan_layers.py:24-28)."""
    return 1.0 / fan_in


def leaky_relu(x, alpha=0.2):
    return jnp.where(x >= 0, x, alpha * x)
