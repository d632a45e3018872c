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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


# ---------------------------------------------------------------------------
# tile-binned rasterizer (the production path)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("image_size", "tile", "max_faces_per_tile")
)
def rasterize_mesh_binned(
    verts_screen: jax.Array,
    faces: jax.Array,
    image_size: Tuple[int, int],
    tile: int = 32,
    max_faces_per_tile: int = 2048,
):
    """Two-level z-buffer rasterization: bin faces to screen tiles by
    bounding box, then run the dense barycentric test only against each
    tile's top-K candidates.

    The brute-force path above tests all (pixel, face) pairs —
    H*W*F ≈ 1.8e9 VPU tests per image at 512x256/SMPL shapes, which measured
    ~300 ms/image on v5e and dominated the whole pipeline.  Binning keeps
    every shape static (the TPU constraint that rules out classical
    variable-length bins): the candidate list is a top-K over a (tiles, F)
    bbox-overlap matrix, K fixed.  Pair work drops ~F/K-fold; a tile
    overlapping more than K faces keeps the K lowest-indexed candidates
    (validated against the dense rasterizer in tests; K=2048 is ~6x the
    densest tile occupancy seen for posed SMPL bodies at 512x256).

    Same signature/returns as ``rasterize_mesh``.
    """
    H, W = image_size
    B, V, _ = verts_screen.shape
    F = faces.shape[0]
    K = min(max_faces_per_tile, F)
    tiles_y = -(-H // tile)
    tiles_x = -(-W // tile)
    T = tiles_y * tiles_x

    span = W / H
    # pixel centers (same grid as the renderer), padded to whole tiles
    xs = jnp.linspace(-span, span, W, dtype=jnp.float32)
    ys = jnp.linspace(-1.0, 1.0, H, dtype=jnp.float32)
    xs = jnp.pad(xs, (0, tiles_x * tile - W), constant_values=2.0 * _BIG)
    ys = jnp.pad(ys, (0, tiles_y * tile - H), constant_values=2.0 * _BIG)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (Hp, Wp)
    # tile-major pixel layout: (T, tile*tile, 2)
    gx_t = gx.reshape(tiles_y, tile, tiles_x, tile).transpose(0, 2, 1, 3).reshape(T, tile * tile)
    gy_t = gy.reshape(tiles_y, tile, tiles_x, tile).transpose(0, 2, 1, 3).reshape(T, tile * tile)

    # tile bounds in grid units (exact pixel-center bounds)
    x_step = 2 * span / max(W - 1, 1)
    y_step = 2.0 / max(H - 1, 1)
    tx0 = -span + jnp.arange(tiles_x) * tile * x_step
    ty0 = -1.0 + jnp.arange(tiles_y) * tile * y_step
    tile_x0 = jnp.tile(tx0, tiles_y)
    tile_y0 = jnp.repeat(ty0, tiles_x)
    tile_x1 = tile_x0 + (tile - 1) * x_step
    tile_y1 = tile_y0 + (tile - 1) * y_step

    tri = verts_screen[:, faces.reshape(-1), :].reshape(B, F, 3, 3)
    fx0 = jnp.min(tri[..., 0], axis=2)  # (B, F)
    fx1 = jnp.max(tri[..., 0], axis=2)
    fy0 = jnp.min(tri[..., 1], axis=2)
    fy1 = jnp.max(tri[..., 1], axis=2)

    # bbox overlap (B, T, F)
    overlap = (
        (fx0[:, None, :] <= tile_x1[None, :, None])
        & (fx1[:, None, :] >= tile_x0[None, :, None])
        & (fy0[:, None, :] <= tile_y1[None, :, None])
        & (fy1[:, None, :] >= tile_y0[None, :, None])
    )
    # deterministic top-K candidate faces per tile (lowest indices first)
    scores = jnp.where(overlap, jnp.float32(F) - jnp.arange(F, dtype=jnp.float32), -1.0)
    top_vals, cand = jax.lax.top_k(scores, K)  # (B, T, K)
    cand_valid = top_vals > 0

    tri_cand = jnp.take_along_axis(
        tri.reshape(B, F, 9)[:, None], cand[..., None], axis=2
    ).reshape(B, T, K, 3, 3)

    def per_tile(args):
        tri_k, valid, px, py = args  # (B,K,3,3), (B,K), (P,), (P,)
        a = tri_k[:, :, 0]
        b = tri_k[:, :, 1]
        c = tri_k[:, :, 2]
        v0 = b[..., :2] - a[..., :2]
        v1 = c[..., :2] - a[..., :2]
        denom = v0[..., 0] * v1[..., 1] - v0[..., 1] * v1[..., 0]  # (B,K)
        ok = valid & (jnp.abs(denom) > 1e-9)
        inv = jnp.where(ok, 1.0 / jnp.where(ok, denom, 1.0), 0.0)

        v2x = px[None, None, :] - a[..., 0][..., None]  # (B,K,P)
        v2y = py[None, None, :] - a[..., 1][..., None]
        w1 = (v2x * v1[..., 1][..., None] - v2y * v1[..., 0][..., None]) * inv[..., None]
        w2 = (v0[..., 0][..., None] * v2y - v0[..., 1][..., None] * v2x) * inv[..., None]
        w0 = 1.0 - w1 - w2
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & ok[..., None]
        zf = (
            w0 * tri_k[:, :, 0, 2][..., None]
            + w1 * tri_k[:, :, 1, 2][..., None]
            + w2 * tri_k[:, :, 2, 2][..., None]
        )
        zf = jnp.where(inside, zf, _BIG)
        best = jnp.argmin(zf, axis=1)  # (B, P) index into K
        best_z = jnp.take_along_axis(zf, best[:, None, :], axis=1)[:, 0]
        take = lambda w: jnp.take_along_axis(w, best[:, None, :], axis=1)[:, 0]
        bary = jnp.stack([take(w0), take(w1), take(w2)], axis=-1)
        return best, best_z, bary

    # map over tiles: transient block is (B, K, tile*tile)
    best_k, zbuf_t, bary_t = jax.lax.map(
        per_tile,
        (
            jnp.moveaxis(tri_cand, 1, 0),      # (T, B, K, 3, 3)
            jnp.moveaxis(cand_valid, 1, 0),    # (T, B, K)
            gx_t,                              # (T, P)
            gy_t,
        ),
    )
    # best_k: (T, B, P) -> face ids via candidate table
    best_k = jnp.moveaxis(best_k, 0, 1)  # (B, T, P)
    zbuf_t = jnp.moveaxis(zbuf_t, 0, 1)
    bary_t = jnp.moveaxis(bary_t, 0, 1)

    face_id = jnp.take_along_axis(cand, best_k, axis=2)  # (B, T, P)
    face_id = jnp.where(zbuf_t >= _BIG, -1, face_id).astype(jnp.int32)

    # tile-major -> image layout, crop padding
    def untile(x, ch=None):
        shape = (B, tiles_y, tiles_x, tile, tile) + ((ch,) if ch else ())
        x = x.reshape(shape)
        x = x.transpose(0, 1, 3, 2, 4, 5) if ch else x.transpose(0, 1, 3, 2, 4)
        x = x.reshape((B, tiles_y * tile, tiles_x * tile) + ((ch,) if ch else ()))
        return x[:, :H, :W]

    return untile(face_id), untile(bary_t, 3), untile(zbuf_t)


# ---------------------------------------------------------------------------
# Pallas tile rasterizer (binned candidates tested entirely in VMEM)
# ---------------------------------------------------------------------------


def _bin_candidates(verts_screen, faces, image_size, tile, K):
    """Shared binning prep: per-tile top-K candidate faces by bbox overlap.
    Returns (tri (B,F,3,3), cand (B,T,K) int32, cand_valid (B,T,K) bool,
    grid geometry)."""
    H, W = image_size
    B = verts_screen.shape[0]
    F = faces.shape[0]
    tiles_y = -(-H // tile)
    tiles_x = -(-W // tile)

    span = W / H
    x_step = 2 * span / max(W - 1, 1)
    y_step = 2.0 / max(H - 1, 1)
    tx0 = -span + jnp.arange(tiles_x) * tile * x_step
    ty0 = -1.0 + jnp.arange(tiles_y) * tile * y_step
    tile_x0 = jnp.tile(tx0, tiles_y)
    tile_y0 = jnp.repeat(ty0, tiles_x)
    tile_x1 = tile_x0 + (tile - 1) * x_step
    tile_y1 = tile_y0 + (tile - 1) * y_step

    tri = verts_screen[:, faces.reshape(-1), :].reshape(B, F, 3, 3)
    fx0 = jnp.min(tri[..., 0], axis=2)
    fx1 = jnp.max(tri[..., 0], axis=2)
    fy0 = jnp.min(tri[..., 1], axis=2)
    fy1 = jnp.max(tri[..., 1], axis=2)

    overlap = (
        (fx0[:, None, :] <= tile_x1[None, :, None])
        & (fx1[:, None, :] >= tile_x0[None, :, None])
        & (fy0[:, None, :] <= tile_y1[None, :, None])
        & (fy1[:, None, :] >= tile_y0[None, :, None])
    )
    scores = jnp.where(overlap, jnp.float32(F) - jnp.arange(F, dtype=jnp.float32), -1.0)
    top_vals, cand = jax.lax.top_k(scores, K)
    return tri, cand, top_vals > 0, (tiles_y, tiles_x, x_step, y_step, span)


def _rasterize_tile_kernel(tri_ref, out_ref, *, K, k_chunk, tile, tiles_x,
                           x_step, y_step, span, pixels):
    """One (batch, tile) program: z-test `K` candidate faces against the
    tile's `pixels` pixels without leaving VMEM.

    tri_ref block: (1, 1, K, 11) — rows are candidate faces, columns
    [ax ay az bx by bz cx cy cz valid face_id] (face_id as f32; exactly
    representable for meshes < 2^24 faces).
    out_ref block: (1, 1, 8, pixels) — rows [w0 w1 w2 z fid 0 0 0].

    Barycentric coordinates are affine in pixel coordinates, so each
    chunk computes 2x (Kc,1)*(1,P) broadcast FMAs per coordinate — pure
    VPU work on data that lives in registers, with a running
    (z, argface, bary) reduction across chunks (the XLA formulation
    materializes every (K, P) intermediate in HBM, which measures ~6x
    slower at MAP3DBN512 shapes).
    """
    P = pixels
    t = pl.program_id(1)
    f32 = jnp.float32

    # pixel centers of this tile from iota (no pixel-coord input at all)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    row_i = lane_i // tile
    col_i = lane_i - row_i * tile
    tx = t % tiles_x
    ty = t // tiles_x
    x0 = -span + (tx * tile).astype(f32) * x_step
    y0 = -1.0 + (ty * tile).astype(f32) * y_step
    px = x0 + col_i.astype(f32) * x_step   # (1, P)
    py = y0 + row_i.astype(f32) * y_step

    best_z = jnp.full((1, P), _BIG, f32)
    best_f = jnp.full((1, P), -1.0, f32)
    best_w0 = jnp.zeros((1, P), f32)
    best_w1 = jnp.zeros((1, P), f32)
    best_w2 = jnp.zeros((1, P), f32)

    # chunk loop as fori_loop with the running best as carry: Mosaic does
    # not reuse stack buffers across unrolled iterations, so a Python
    # unroll allocates every chunk's (Kc, P) temporaries simultaneously
    # (~36 MB at K=2048 — over the 16 MB VMEM budget)
    def chunk_body(c, carry):
        best_z, best_f, best_w0, best_w1, best_w2 = carry
        tri = tri_ref[0, 0, pl.ds(c * k_chunk, k_chunk), :]      # (Kc, 11)
        ax, ay, az = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
        bx, by, bz = tri[:, 3:4], tri[:, 4:5], tri[:, 5:6]
        cx, cy, cz = tri[:, 6:7], tri[:, 7:8], tri[:, 8:9]
        valid = tri[:, 9:10]
        fid = tri[:, 10:11]

        v0x, v0y = bx - ax, by - ay
        v1x, v1y = cx - ax, cy - ay
        denom = v0x * v1y - v0y * v1x
        ok = (jnp.abs(denom) > 1e-9) & (valid > 0.0)
        inv = jnp.where(ok, 1.0 / jnp.where(ok, denom, 1.0), 0.0)

        # w1 = ((px-ax)v1y - (py-ay)v1x)*inv ; w2 = (v0x(py-ay) - v0y(px-ax))*inv
        c1x, c1y = inv * v1y, -inv * v1x
        c1c = inv * (ay * v1x - ax * v1y)
        c2x, c2y = -inv * v0y, inv * v0x
        c2c = inv * (v0y * ax - v0x * ay)

        w1 = c1x * px + c1y * py + c1c          # (Kc, 1)*(1, P) -> (Kc, P)
        w2 = c2x * px + c2y * py + c2c
        w0 = 1.0 - w1 - w2
        inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0) & ok
        z = az + w1 * (bz - az) + w2 * (cz - az)
        zf = jnp.where(inside, z, _BIG)

        zmin = jnp.min(zf, axis=0, keepdims=True)                 # (1, P)
        krow = jax.lax.broadcasted_iota(jnp.int32, zf.shape, 0).astype(f32)
        kbest = jnp.min(jnp.where(zf <= zmin, krow, 3.4e38), axis=0,
                        keepdims=True)
        hit = krow == kbest                                       # one-hot (Kc, P)
        pick = lambda w: jnp.sum(jnp.where(hit, w, 0.0), axis=0, keepdims=True)

        closer = zmin < best_z
        best_f = jnp.where(closer, pick(fid * jnp.ones_like(zf)), best_f)
        best_w0 = jnp.where(closer, pick(w0), best_w0)
        best_w1 = jnp.where(closer, pick(w1), best_w1)
        best_w2 = jnp.where(closer, pick(w2), best_w2)
        best_z = jnp.where(closer, zmin, best_z)
        return best_z, best_f, best_w0, best_w1, best_w2

    best_z, best_f, best_w0, best_w1, best_w2 = jax.lax.fori_loop(
        0, K // k_chunk, chunk_body,
        (best_z, best_f, best_w0, best_w1, best_w2))

    best_f = jnp.where(best_z < _BIG, best_f, -1.0)
    zeros = jnp.zeros((3, P), f32)
    out_ref[0, 0] = jnp.concatenate(
        [best_w0, best_w1, best_w2, best_z, best_f, zeros], axis=0)


@functools.partial(
    jax.jit, static_argnames=("image_size", "tile", "max_faces_per_tile",
                              "k_chunk", "interpret")
)
def rasterize_mesh_pallas(
    verts_screen: jax.Array,
    faces: jax.Array,
    image_size: Tuple[int, int],
    tile: int = 32,
    max_faces_per_tile: int = 640,
    k_chunk: int = 128,
    interpret: bool = False,
):
    """Tile-binned rasterization with the per-tile z-test as a Pallas
    kernel.  Same signature/returns as ``rasterize_mesh`` /
    ``rasterize_mesh_binned``; binning (bbox overlap + top-K) stays XLA.

    Replaces pytorch3d's CUDA MeshRasterizer on the reference's hot path
    (lib/data/preprocessor.py:137-176).
    """
    H, W = image_size
    B, V, _ = verts_screen.shape
    F = faces.shape[0]
    K = min(max_faces_per_tile, F)
    K = -(-K // k_chunk) * k_chunk  # whole chunks

    tri, cand, cand_valid, (tiles_y, tiles_x, x_step, y_step, span) = \
        _bin_candidates(verts_screen, faces, image_size, tile, K)
    T = tiles_y * tiles_x
    P = tile * tile

    # candidate face table: (B, T, K, 11) = [9 coords, valid, face_id]
    tri_cand = jnp.take_along_axis(
        tri.reshape(B, F, 9)[:, None], cand[..., None], axis=2
    ).reshape(B, T, K, 9)
    tri_k = jnp.concatenate(
        [tri_cand, cand_valid[..., None].astype(jnp.float32),
         cand[..., None].astype(jnp.float32)], axis=-1)

    kernel = functools.partial(
        _rasterize_tile_kernel, K=K, k_chunk=k_chunk, tile=tile,
        tiles_x=tiles_x, x_step=x_step, y_step=y_step, span=span, pixels=P)

    out = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[pl.BlockSpec((1, 1, K, 11), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 8, P), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, 8, P), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * T * K * P * 12,
            bytes_accessed=B * T * (K * 11 + 8 * P) * 4,
            transcendentals=0),
        interpret=interpret,
    )(tri_k)

    bary_t = jnp.moveaxis(out[:, :, 0:3], 2, 3)        # (B, T, P, 3)
    zbuf_t = out[:, :, 3]                              # (B, T, P)
    face_id = out[:, :, 4].astype(jnp.int32)

    def untile(x, ch=None):
        shape = (B, tiles_y, tiles_x, tile, tile) + ((ch,) if ch else ())
        x = x.reshape(shape)
        x = x.transpose(0, 1, 3, 2, 4, 5) if ch else x.transpose(0, 1, 3, 2, 4)
        x = x.reshape((B, tiles_y * tile, tiles_x * tile) + ((ch,) if ch else ()))
        return x[:, :H, :W]

    return untile(face_id), untile(bary_t, 3), untile(zbuf_t)
