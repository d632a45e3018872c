"""Standalone fused geo-features Pallas kernel (1-NN + gather + canonicalize).

``models.smpl.get_geo_features`` (ref lib/components/smpl.py:210-249) is the
per-point 31-d conditioning: distances to the 24 joints, inverse-FK
canonicalized coords of the nearest SMPL vertex, that vertex's T-pose coords,
and the nearest-vertex distance.  The XLA formulation pays a (B, P, 16+3)
``knn_gather`` — TPU gathers run on the scalar unit and the stage measured
44 ms/batch8 at MAP3DBN512L shapes (147k points/image), ~20% of the whole
inference pipeline.

This kernel runs the stage in VMEM tiles with a TRANSPOSED (vertex-major)
layout, which is the part that matters:

  * distances   d (Vp, T) = A @ p_aug, ONE MXU matmul: A = [v, |v|^2/2]
                (Vp, 4) against p_aug = [-p; 1] (4, T), so the |v|^2 bias
                rides the contraction and no VPU pass touches the (Vp, T)
                tile to form d.  The per-point |p|^2/2 term is a constant
                per COLUMN — it cannot change the row-argmin — so it is
                dropped from the tile and only restored on the (1, T)
                nearest-distance row (every elementwise op here streams
                B*Vp*P = 8e9 elements at 512L shapes; round-2 formed d
                with two such passes and measured 0.6%-of-roofline)
  * 1-NN        argmin over the SUBLANE axis (iota rows + min algebra)
  * gather      (19, T) = vfeat^T (19, Vp) @ onehot (Vp, T)  -- ONE MXU
                matmul whose padded row count is 24, not the point tile's
                128: the point-major form (onehot (T, Vp) @ vfeat (Vp, 19))
                pads the 19 output columns to a full 128-lane tile and
                wastes ~6.7x the MACs.
  * canonicalization / joint distances as (rows, T) VPU algebra.

Output is written vertex-major (B, 31, P) and transposed once in XLA (a
146 MB stream at 512L shapes, ~0.4 ms) — everything else never leaves VMEM.

The vertex axis is scanned as a fori_loop over VMEM-bounded chunks (round-4
robustness fix): the round-3 kernel materialized the full (Vp, T) distance
tile and sat at the edge of the 16 MB scoped-VMEM budget — batch 8 compiled
but batch 12/16 blew the stack by 4-6 MB (XLA's scoped accounting shifts
with surrounding layout choices).  Loop iterations reuse their stack
buffers, so the live tile is (Vp/n_chunks, T) at identical total work, and
every batch 4..32 AOT-compiles with headroom.

All dots are f32: the ik entries feed omega=30 SIREN inputs downstream and
the one-hot selection must be exact (tie-breaking = lowest index, torch
``min`` semantics like pytorch3d knn_points).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GEO_DIM = 31  # 3 cano + 24 joint dists + 3 tpose + 1 nearest dist


def auto_geo_tile(n_vertices_padded: int, budget: int = 14 * 2 ** 20) -> int:
    """Point-tile size.  With the vertex-chunked kernel the (Vc, T) working
    tile no longer scales with V (auto_geo_chunks bounds it), so the point
    tile is a fixed 1024 — swept on v5e at 512L shapes with the native-
    argmin kernel (benchmarks/dev/prof_geo_chunks.py, ms/batch8):

        tile        256    512    1024
        chunks=1   19.3   14.9   14.4
        chunks=2   23.9   16.1   15.3
        chunks=4   25.1   16.3   15.1
        chunks=8   29.8   18.3   16.0

    More chunks only cost (no cross-chunk MXU/VPU pipelining materializes);
    larger tiles amortize the per-tile fixed work.  1024/chunks=4 keeps the
    live distance tile at 7.1 MB — inside auto_geo_chunks' 8 MB headroom
    budget (the round-4 robustness constraint) — at 94% of the unchunked
    kernel's speed."""
    del n_vertices_padded, budget
    return 1024


def auto_geo_chunks(n_vertices_padded: int, tile_points: int,
                    budget: int = 8 * 2 ** 20) -> int:
    """Number of vertex chunks such that the kernel's live (Vc, T) f32
    distance tile stays under ``budget``.  The round-3 kernel materialized
    the full (Vp, T) tile (14.2 MB at 512L shapes) and sat at the edge of
    the 16 MB scoped-VMEM budget: batch 8 compiled but batch 12 (and batch
    16 inside the full generation graph) blew the stack by several MB —
    XLA's scoped accounting shifts with surrounding layout choices, so the
    kernel must leave real headroom rather than fit exactly."""
    full = n_vertices_padded * tile_points * 4
    return max(1, -(-full // budget))


def _geo_kernel(pts_ref, va_ref, vfeat_ref, skel_ref, ssq_ref,
                out_ref, *, legacy_mode, n_chunks, chunk):
    """One (4, T) tile of augmented points [-p; 1] -> (31, T) geo features.

    The 1-NN scan runs as a fori_loop over ``n_chunks`` vertex chunks of
    ``chunk`` rows: loop iterations REUSE their stack buffers (the round-2
    Mosaic finding), so the live distance tile is (chunk, T) instead of
    (Vp, T) regardless of the mesh size."""
    f32 = jnp.float32
    ptsa = pts_ref[0]         # (4, T): [-x, -y, -z, 1]
    skel = skel_ref[0]        # (J, 3)
    ssq = ssq_ref[0]          # (J, 1)
    T = ptsa.shape[1]

    pts_t = -ptsa[0:3]                                    # (3, T) raw coords
    p_sq = jnp.sum(pts_t * pts_t, axis=0, keepdims=True)  # (1, T)

    # joint distances (ref smpl.py:216), J rows
    crossj = jax.lax.dot_general(skel, pts_t, (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)    # (J, T)
    jd = jnp.sqrt(jnp.maximum(ssq - 2.0 * crossj + p_sq, 0.0) + 1e-12) / 2.4

    # 1-NN over all vertices, one vertex chunk at a time.  Within a chunk:
    # the (chunk, T) half-distance tile comes STRAIGHT out of the MXU
    # (|v|^2/2 rides the augmented contraction; |p|^2/2 is constant per
    # column so it can't change the argmin and is left out); argmin over
    # the sublane axis via iota + min algebra; the winning row's
    # [ik(16); tpose(3)] via one vertex-major MXU matmul.  Across chunks:
    # a strict-less merge in ascending chunk order keeps the LOWEST global
    # index on exact ties (torch min semantics), because the local iota
    # pick is the lowest index within the chunk.
    def chunk_body(c, carry):
        best_d, best_g = carry
        va = va_ref[0, c]         # (chunk, 4): [v, |v|^2/2]; pad rows lose
        vfeat_t = vfeat_ref[0, c]  # (19, chunk)
        d = jax.lax.dot_general(va, ptsa, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)     # (chunk, T)
        dmin = jnp.min(d, axis=0, keepdims=True)                # (1, T)
        # native argmin: Mosaic lowers this as a fused sublane reduce that
        # rides the same traversal as the min — the round-4 hand-rolled
        # iota/where/min extraction pass cost 8.7 ms/batch8 on its own
        # (benchmarks/dev/prof_geo_breakdown.py: argmin 20.7 vs jargmin
        # 12.2 ms).  First-occurrence tie-break = lowest index = torch min
        # semantics; on hardware the fused reduce resolves NEAR-ties
        # (distances equal to ~1e-6 relative but not bit-equal)
        # approximately — 99.99% argmin agreement on adversarially
        # tie-dense random gaussians, 100% on exact ties and in interpret
        # mode (XLA argmin).
        arg = jnp.argmin(d, axis=0)[None].astype(jnp.int32)     # (1, T)
        rows = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
        onehot = (rows == arg).astype(f32)                      # (chunk, T)
        g = jax.lax.dot_general(vfeat_t, onehot, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)     # (19, T)
        better = dmin < best_d                                  # (1, T)
        return (jnp.where(better, dmin, best_d),
                jnp.where(jnp.broadcast_to(better, g.shape), g, best_g))

    init = (jnp.full((1, T), jnp.inf, f32), jnp.zeros((19, T), f32))
    dmin, gathered = jax.lax.fori_loop(0, n_chunks, chunk_body, init)

    x = pts_t[0:1]
    y = pts_t[1:2]
    z1 = pts_t[2:3]
    g = lambda i: gathered[i : i + 1, :]
    # inverse-FK canonicalization: rows of the blended 4x4 (ref :219-230)
    cano0 = (g(0) * x + g(1) * y + g(2) * z1 + g(3)) / 2.0
    cano1 = (g(4) * x + g(5) * y + g(6) * z1 + g(7) + 0.2) / 2.0
    cano2 = (g(8) * x + g(9) * y + g(10) * z1 + g(11)) / 1.3
    tp2 = g(18) / 0.2
    # dmin is |v|^2/2 - v.p; restore the dropped |p|^2/2: |v-p|^2 = 2*dmin + p_sq
    ndist = jnp.sqrt(jnp.maximum(2.0 * dmin + p_sq, 0.0)) / 1.3

    cano = jnp.concatenate([cano0, cano1, cano2], axis=0)       # (3, T)
    tp = jnp.concatenate([g(16), g(17), tp2], axis=0)           # (3, T)
    if legacy_mode:
        out = jnp.concatenate([jd, cano, tp, ndist], axis=0)
    else:
        out = jnp.concatenate([cano, jd, tp, ndist], axis=0)
    out_ref[0] = out


@functools.partial(
    jax.jit,
    static_argnames=("legacy_mode", "tile_points", "vertex_chunks", "interpret"),
)
def geo_features_pallas(
    points: jax.Array,      # (B, P, 3) raw world points
    vertices: jax.Array,    # (B, V, 3) posed vertices
    vfeat: jax.Array,       # (B, V, 19) [blended inverse-FK 16; tpose 3]
    skeletons: jax.Array,   # (B, J, 3)
    legacy_mode: bool = False,
    tile_points: int | None = None,
    vertex_chunks: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Returns (B, P, 31) f32 geo features (models.smpl.get_geo_features
    semantics, ref smpl.py:210-249).  ``tile_points=None`` picks the swept
    default (`auto_geo_tile`); ``vertex_chunks=None`` bounds the live
    distance tile to the VMEM headroom budget (`auto_geo_chunks`)."""
    B, P, _ = points.shape
    V = vertices.shape[1]
    Vp128 = V + (-V) % 128
    if tile_points is None:
        tile_points = auto_geo_tile(Vp128)
    if vertex_chunks is None:
        vertex_chunks = auto_geo_chunks(Vp128, tile_points)
    pad_p = (-P) % tile_points
    if pad_p:
        points = jnp.pad(points, ((0, 0), (0, pad_p), (0, 0)))
    Pp = P + pad_p
    n_tiles = Pp // tile_points

    # chunk rows: multiple of the 8-row f32 sublane; total padded vertex
    # count is n_chunks * chunk
    chunk = -(-Vp128 // vertex_chunks)
    chunk += (-chunk) % 8
    Vp = vertex_chunks * chunk
    pad_v = Vp - V
    verts_p = jnp.pad(vertices.astype(jnp.float32), ((0, 0), (0, pad_v), (0, 0)),
                      constant_values=1e6)
    # augmented vertex table [v, |v|^2/2]: the bias column makes the in-kernel
    # distance tile a single MXU product (padded rows land at ~1.5e12, body-
    # scale points can never select them)
    vsq = 0.5 * jnp.sum(jnp.square(verts_p), axis=-1)[..., None]  # (B, Vp, 1)
    va = jnp.concatenate([verts_p, vsq], axis=-1)               # (B, Vp, 4)
    va = va.reshape(B, vertex_chunks, chunk, 4)
    vfeat_t = jnp.swapaxes(
        jnp.pad(vfeat.astype(jnp.float32), ((0, 0), (0, pad_v), (0, 0))), 1, 2)
    vfeat_t = vfeat_t.reshape(B, 19, vertex_chunks, chunk).transpose(0, 2, 1, 3)
    J = skeletons.shape[1]
    skel = skeletons.astype(jnp.float32)                        # (B, J, 3)
    ssq = jnp.sum(jnp.square(skel), axis=-1)[..., None]         # (B, J, 1)

    pts_t = jnp.swapaxes(points.astype(jnp.float32), 1, 2)      # (B, 3, Pp)
    ptsa = jnp.concatenate(
        [-pts_t, jnp.ones((B, 1, Pp), pts_t.dtype)], axis=1)    # (B, 4, Pp)

    kernel = functools.partial(_geo_kernel, legacy_mode=legacy_mode,
                               n_chunks=vertex_chunks, chunk=chunk)

    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 4, tile_points), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vertex_chunks, chunk, 4), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vertex_chunks, 19, chunk), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, J, 3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, J, 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, GEO_DIM, tile_points), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, GEO_DIM, Pp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * Pp * 2 * (Vp * (4 + 19) + J * 3),
            bytes_accessed=B * Pp * (4 + GEO_DIM) * 4 + B * Vp * 23 * 4,
            transcendentals=B * Pp * (J + 1),
        ),
        interpret=interpret,
    )(ptsa, va, vfeat_t, skel, ssq)

    return jnp.swapaxes(out, 1, 2)[:, :P]  # (B, P, 31)


def build_vertex_features(
    tpose_vertices: jax.Array,  # (B, V, 3)
    fk_matrices: jax.Array,     # (B, J, 4, 4)
    lbs_weights: jax.Array,     # (B, V, J)
) -> jax.Array:
    """Per-vertex [blended inverse-FK (16); tpose (3)] table for the kernel
    (the only XLA-side prep; tiny: B x V x 19)."""
    B, V, _ = tpose_vertices.shape
    ik = jnp.linalg.inv(fk_matrices.astype(jnp.float32))
    vertex_ik = jnp.einsum("bvj,bjkl->bvkl", lbs_weights.astype(jnp.float32), ik)
    return jnp.concatenate(
        [vertex_ik.reshape(B, V, 16), tpose_vertices.astype(jnp.float32)], axis=-1)
