"""Brute-force K-nearest-neighbour search as MXU matmuls.

Replaces pytorch3d's CUDA ``knn_points``/``knn_gather`` (hot path of the
reference: lib/components/smpl.py:220-233 — 1-NN of every field sample
against the 6,890 posed SMPL vertices).

TPU-first design: a KD-tree is the wrong shape for a systolic array.  The
squared distance matrix decomposes as |p|^2 - 2 p·v + |v|^2 — one
(P, 3) x (3, V) matmul plus rank-1 corrections — so the whole search is a
single MXU pass over a (P, V) tile grid with an argmin reduction, done in
chunks so the (P, V) matrix never fully materializes in HBM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _chunk_count(n_points: int, chunk: int) -> int:
    return -(-n_points // chunk)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_points(
    points: jax.Array, verts: jax.Array, k: int = 1, chunk: int = 8192
) -> Tuple[jax.Array, jax.Array]:
    """K nearest verts for each point.

    Args:
      points: (B, P, 3)
      verts:  (B, V, 3)
      k: neighbours to return.
      chunk: point-axis tile so the (chunk, V) distance tile stays on-chip.

    Returns:
      (dists, idx): squared distances (B, P, k) and indices (B, P, k),
      matching pytorch3d ``knn_points`` output semantics.
    """
    B, P, _ = points.shape
    V = verts.shape[1]
    n_chunks = _chunk_count(P, chunk)
    pad = n_chunks * chunk - P
    pts = jnp.pad(points, ((0, 0), (0, pad), (0, 0)))
    pts = pts.reshape(B, n_chunks, chunk, 3)

    v_sq = jnp.sum(jnp.square(verts), axis=-1)  # (B, V)

    def per_chunk(p_chunk, v, v_sq):
        # p_chunk: (chunk, 3); v: (V, 3)
        # K-dim is 3: the matmul is bandwidth-bound, so full precision is
        # free and keeps argmin stable for near-tied vertices.
        cross = jnp.dot(p_chunk, v.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (chunk, V)
        d = jnp.sum(jnp.square(p_chunk), axis=-1, keepdims=True) - 2.0 * cross + v_sq[None, :]
        if k == 1:
            idx = jnp.argmin(d, axis=-1)
            dist = jnp.take_along_axis(d, idx[:, None], axis=-1)
            return dist, idx[:, None]
        neg_d, idx = jax.lax.top_k(-d, k)
        return -neg_d, idx

    def per_batch(p_b, v_b, v_sq_b):
        return jax.lax.map(lambda pc: per_chunk(pc, v_b, v_sq_b), p_b)

    dists, idx = jax.vmap(per_batch)(pts, verts, v_sq)
    dists = dists.reshape(B, n_chunks * chunk, k)[:, :P]
    idx = idx.reshape(B, n_chunks * chunk, k)[:, :P]
    return jnp.maximum(dists, 0.0), idx


# ---------------------------------------------------------------------------
# Pallas 1-NN kernel
# ---------------------------------------------------------------------------


def _nn_kernel(pts_ref, verts_ref, vsq_ref, dist_ref, idx_ref, *, v_chunk, n_verts_padded):
    """1-NN of a point tile against all vertices, fully in VMEM.

    The XLA path materializes each (chunk, V) distance matrix in HBM twice
    (distances, then argmin) — ~160 ms at MAP3DBN512 shapes on v5e.  Here
    the (TILE_P, v_chunk) distance tile lives only in registers/VMEM with a
    running (min, argmin) carried across vertex chunks.
    """
    pts = pts_ref[0]          # (TILE_P, 3)
    p_sq = jnp.sum(jnp.square(pts), axis=1, keepdims=True)  # (TILE_P, 1)

    tile_p = pts.shape[0]
    best_d = jnp.full((tile_p, 1), 1e30, jnp.float32)
    best_i = jnp.zeros((tile_p, 1), jnp.float32)

    n_chunks = n_verts_padded // v_chunk
    for ci in range(n_chunks):
        vc = verts_ref[0, :, ci * v_chunk : (ci + 1) * v_chunk]      # (3, v_chunk)
        vsq = vsq_ref[0, :, ci * v_chunk : (ci + 1) * v_chunk]       # (1, v_chunk)
        cross = jax.lax.dot_general(
            pts, vc, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        d = p_sq - 2.0 * cross + vsq                                 # (TILE_P, v_chunk)
        dmin = jnp.min(d, axis=1, keepdims=True)
        # argmin via masked lane-iota (portable across Mosaic versions)
        lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1).astype(jnp.float32)
        arg = jnp.min(jnp.where(d <= dmin, lane, 3.4e38), axis=1, keepdims=True)
        closer = dmin < best_d
        best_d = jnp.where(closer, dmin, best_d)
        best_i = jnp.where(closer, arg + ci * v_chunk, best_i)

    dist_ref[0] = jnp.maximum(best_d, 0.0)
    idx_ref[0] = best_i.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_p", "v_chunk", "interpret"))
def nn_points_pallas(
    points: jax.Array, verts: jax.Array, tile_p: int = 1024, v_chunk: int = 512,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Pallas 1-NN: (B, P, 3) x (B, V, 3) -> dists (B, P, 1), idx (B, P, 1)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, P, _ = points.shape
    V = verts.shape[1]
    pad_p = (-P) % tile_p
    pad_v = (-V) % v_chunk
    pts = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, pad_p), (0, 0)))
    # pad with far-away vertices so they never win
    vts = jnp.pad(verts.astype(jnp.float32), ((0, 0), (0, pad_v), (0, 0)),
                  constant_values=1e6)
    Vp = V + pad_v
    Pp = P + pad_p
    verts_t = jnp.swapaxes(vts, 1, 2)                     # (B, 3, Vp)
    vsq = jnp.sum(jnp.square(vts), axis=-1)[:, None, :]   # (B, 1, Vp)

    grid = (B, Pp // tile_p)
    dist, idx = pl.pallas_call(
        functools.partial(_nn_kernel, v_chunk=v_chunk, n_verts_padded=Vp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_p, 3), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Vp), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Vp), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_p, 1), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, 1), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Pp, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, Pp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(pts, verts_t, vsq)
    return dist[:, :P], idx[:, :P]


def knn_gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather features at KNN indices (pytorch3d ``knn_gather`` semantics).

    Args:
      x:   (B, V, C)
      idx: (B, P, K)
    Returns:
      (B, P, K, C)
    """
    return jax.vmap(lambda xb, ib: xb[ib])(x, idx)
