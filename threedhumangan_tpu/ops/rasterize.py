"""Triangle-mesh rasterization in pure XLA (pytorch3d MeshRasterizer replacement).

The reference rasterizes the posed SMPL mesh every training batch and every
inference frame with pytorch3d's CUDA rasterizer (lib/data/preprocessor.py:
137-176) to produce the pose-conditioning images.  There is no TPU library
for this, so we build it from scratch (SURVEY.md §7 hard-part #1).

TPU-first design:
  * fixed shapes everywhere — (faces are a static (F, 3) table; the screen
    is tiled into static pixel chunks; faces stream through static chunks);
  * the inner computation is barycentric edge-function evaluation of a
    (face-chunk x pixel-tile) block — dense vectorized arithmetic on the
    VPU with an (argmin, min-z) running reduction, i.e. a z-buffer expressed
    as a functional scan instead of read-modify-write memory;
  * double ``lax.scan`` (pixel tiles outer, face chunks inner) keeps the
    transient block at O(chunk_faces * tile_pixels) so HBM never sees the
    full (F, H*W) matrix.

Camera convention: callers hand in vertices already projected to the SAME
normalized grid the volume renderer marches rays through
(models/volume_rendering.get_initial_rays_weak_perspective): y in [-1, 1]
over rows, x in [-W/H, W/H] over columns, +z into the screen.  This makes
the rasterized conditions pixel-aligned with the render by construction
(the reference instead approximates alignment with a separate 1-degree-fov
pytorch3d camera, preprocessor.py:145-150).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_BIG = 1e10


@functools.partial(
    jax.jit, static_argnames=("image_size", "face_chunk", "pixel_chunk")
)
def rasterize_mesh(
    verts_screen: jax.Array,
    faces: jax.Array,
    image_size: Tuple[int, int],
    face_chunk: int = 512,
    pixel_chunk: int = 4096,
):
    """Z-buffer rasterization.

    Args:
      verts_screen: (B, V, 3) — x, y in grid units (y in ±1 over rows,
        x in ±(W/H) over columns), z = camera depth (+z forward, smaller =
        closer).
      faces: (F, 3) int vertex indices (static).
      image_size: (H, W).

    Returns:
      pix_to_face: (B, H, W) int32, -1 for background.
      bary_coords: (B, H, W, 3) barycentric coords of the winning face.
      zbuf:        (B, H, W) depth of the winning face (+BIG for background).
    """
    H, W = image_size
    B, V, _ = verts_screen.shape
    F = faces.shape[0]

    # pixel centers matching the renderer's ray grid
    span = W / H
    xs = jnp.linspace(-span, span, W, dtype=jnp.float32)
    ys = jnp.linspace(-1.0, 1.0, H, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pixels = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # (H*W, 2)

    n_pix = H * W
    n_pix_tiles = -(-n_pix // pixel_chunk)
    pix_pad = n_pix_tiles * pixel_chunk - n_pix
    pixels = jnp.pad(pixels, ((0, pix_pad), (0, 0)), constant_values=2.0 * _BIG)
    pixels = pixels.reshape(n_pix_tiles, pixel_chunk, 2)

    # per-face vertex data, padded to whole chunks with degenerate faces
    n_face_tiles = -(-F // face_chunk)
    face_pad = n_face_tiles * face_chunk - F
    tri = verts_screen[:, faces.reshape(-1), :].reshape(B, F, 3, 3)
    tri = jnp.pad(tri, ((0, 0), (0, face_pad), (0, 0), (0, 0)))
    tri = tri.reshape(B, n_face_tiles, face_chunk, 3, 3)

    def rasterize_tile(pix):
        # pix: (pixel_chunk, 2)
        def face_step(carry, tri_chunk):
            zbuf, face_id, bary, base = carry
            a, b, c = tri_chunk[:, :, 0], tri_chunk[:, :, 1], tri_chunk[:, :, 2]
            v0 = b[..., :2] - a[..., :2]  # (B, Fc, 2)
            v1 = c[..., :2] - a[..., :2]
            denom = v0[..., 0] * v1[..., 1] - v0[..., 1] * v1[..., 0]  # (B, Fc)
            valid = jnp.abs(denom) > 1e-9
            inv = jnp.where(valid, 1.0 / jnp.where(valid, denom, 1.0), 0.0)

            v2x = pix[None, None, :, 0] - a[..., 0][..., None]  # (B, Fc, P)
            v2y = pix[None, None, :, 1] - a[..., 1][..., None]
            w1 = (v2x * v1[..., 1][..., None] - v2y * v1[..., 0][..., None]) * inv[..., None]
            w2 = (v0[..., 0][..., None] * v2y - v0[..., 1][..., None] * v2x) * inv[..., None]
            w0 = 1.0 - w1 - w2

            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & valid[..., None]
            z = (
                w0 * tri_chunk[:, :, 0, 2][..., None]
                + w1 * tri_chunk[:, :, 1, 2][..., None]
                + w2 * tri_chunk[:, :, 2, 2][..., None]
            )
            z = jnp.where(inside, z, _BIG)

            # best face in this chunk per pixel
            best = jnp.argmin(z, axis=1)  # (B, P)
            best_z = jnp.take_along_axis(z, best[:, None, :], axis=1)[:, 0]  # (B, P)
            take = lambda w: jnp.take_along_axis(w, best[:, None, :], axis=1)[:, 0]
            best_bary = jnp.stack([take(w0), take(w1), take(w2)], axis=-1)

            closer = best_z < zbuf
            zbuf = jnp.where(closer, best_z, zbuf)
            face_id = jnp.where(closer, base + best.astype(jnp.int32), face_id)
            bary = jnp.where(closer[..., None], best_bary, bary)
            return (zbuf, face_id, bary, base + tri_chunk.shape[1]), None

        init = (
            jnp.full((B, pixel_chunk), _BIG, jnp.float32),
            jnp.full((B, pixel_chunk), -1, jnp.int32),
            jnp.zeros((B, pixel_chunk, 3), jnp.float32),
            jnp.zeros((), jnp.int32),
        )
        (zbuf, face_id, bary, _), _ = jax.lax.scan(
            face_step, init, jnp.moveaxis(tri, 1, 0)
        )
        return zbuf, face_id, bary

    zbuf, face_id, bary = jax.lax.map(rasterize_tile, pixels)
    # lax.map output: (tiles, B, pixel_chunk, ...) -> (B, n_pix, ...)
    zbuf = jnp.moveaxis(zbuf, 0, 1).reshape(B, -1)[:, :n_pix]
    face_id = jnp.moveaxis(face_id, 0, 1).reshape(B, -1)[:, :n_pix]
    bary = jnp.moveaxis(bary, 0, 1).reshape(B, -1, 3)[:, :n_pix]

    # padded (degenerate) faces can never win: their denom==0 marks invalid
    face_id = jnp.where(face_id >= F, -1, face_id)

    return (
        face_id.reshape(B, H, W),
        bary.reshape(B, H, W, 3),
        zbuf.reshape(B, H, W),
    )
