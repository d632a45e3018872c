"""Decompose the fused geo kernel's 22.4 ms/batch8 (VERDICT r4 #6).

PERFORMANCE.md's measured floor (matmul + min = 11.3 ms) leaves ~11 ms in
the argmin-extraction pass, the onehot pass, the (19,chunk)@(chunk,T) f32
gather matmul, and the cross-chunk merges.  This script times ablation
variants of the SAME chunked kernel structure to attribute the gap, plus
two candidate optimizations:

  * packed: single-pass min over f32 distances with the global vertex index
    packed into the low 13 mantissa bits (order-preserving for d>=0; exact
    lowest-index tie-break; argmin quantized to ~2^-10 relative) — removes
    the separate iota/where/min argmin pass AND makes the onehot an exact
    single-winner equality against the packed tile.
  * bf16 gather: onehot (exact in bf16) @ vfeat split hi/lo bf16, f32
    accumulate — trades the f32 MXU matmul rate for 2 bf16 passes.

Usage: python benchmarks/dev/prof_geo_breakdown.py
"""
import functools
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.timing import device_time

B = int(os.environ.get("BENCH_BATCH", "8"))
P = 147456
V = 6890
TILE = 512


def kernel(pts_ref, va_ref, vfeat_ref, out_ref, *, n_chunks, chunk, mode):
    f32 = jnp.float32
    ptsa = pts_ref[0]
    T = ptsa.shape[1]
    pts_t = -ptsa[0:3]
    p_sq = jnp.sum(pts_t * pts_t, axis=0, keepdims=True)

    if mode == "packed":
        def body(c, carry):
            best_p = carry
            va = va_ref[0, c]
            d = jax.lax.dot_general(va, ptsa, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            dpos = d + 0.5 * p_sq  # |v-p|^2/2 >= 0: bitcast is order-preserving
            rows = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0) + c * chunk
            packed = jax.lax.bitwise_or(
                jax.lax.bitwise_and(
                    jax.lax.bitcast_convert_type(dpos, jnp.int32),
                    jnp.int32(-8192)),
                rows)
            pmin = jnp.min(packed, axis=0, keepdims=True)
            return jnp.minimum(best_p, pmin)

        init = jnp.full((1, T), jnp.int32(2**31 - 1))
        pmin = jax.lax.fori_loop(0, n_chunks, body, init)

        def gbody(c, carry):
            g_acc = carry
            va = va_ref[0, c]
            vfeat_t = vfeat_ref[0, c]
            d = jax.lax.dot_general(va, ptsa, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            dpos = d + 0.5 * p_sq
            rows = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0) + c * chunk
            packed = jax.lax.bitwise_or(
                jax.lax.bitwise_and(
                    jax.lax.bitcast_convert_type(dpos, jnp.int32),
                    jnp.int32(-8192)),
                rows)
            onehot = (packed == pmin).astype(f32)
            g = jax.lax.dot_general(vfeat_t, onehot, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            return g_acc + g

        g = jax.lax.fori_loop(0, n_chunks, gbody, jnp.zeros((19, T), f32))
        dmin = jax.lax.bitcast_convert_type(
            jax.lax.bitwise_and(pmin, jnp.int32(-8192)), f32)
        out = jnp.concatenate(
            [g, dmin, jnp.zeros((32 - 20, T), f32)], axis=0)
        out_ref[0] = out
        return

    if mode == "packed1":
        # single loop: packed min AND gather carried together via the
        # strict-less merge on the packed value (local winner per chunk)
        def body(c, carry):
            best_p, best_g = carry
            va = va_ref[0, c]
            vfeat_t = vfeat_ref[0, c]
            d = jax.lax.dot_general(va, ptsa, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            dpos = d + 0.5 * p_sq
            rows = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0) + c * chunk
            packed = jax.lax.bitwise_or(
                jax.lax.bitwise_and(
                    jax.lax.bitcast_convert_type(dpos, jnp.int32),
                    jnp.int32(-8192)),
                rows)
            pmin = jnp.min(packed, axis=0, keepdims=True)
            onehot = (packed == pmin).astype(f32)
            g = jax.lax.dot_general(vfeat_t, onehot, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            better = pmin < best_p
            return (jnp.where(better, pmin, best_p),
                    jnp.where(jnp.broadcast_to(better, g.shape), g, best_g))

        init = (jnp.full((1, T), jnp.int32(2**31 - 1)),
                jnp.zeros((19, T), f32))
        pmin, g = jax.lax.fori_loop(0, n_chunks, body, init)
        dmin = jax.lax.bitcast_convert_type(
            jax.lax.bitwise_and(pmin, jnp.int32(-8192)), f32)
        out = jnp.concatenate(
            [g, dmin, jnp.zeros((32 - 20, T), f32)], axis=0)
        out_ref[0] = out
        return

    def body(c, carry):
        best_d, best_g = carry
        va = va_ref[0, c]
        vfeat_t = vfeat_ref[0, c]
        if mode == "dmin_bf16":
            d = jax.lax.dot_general(
                va.astype(jnp.bfloat16), ptsa.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
        else:
            d = jax.lax.dot_general(va, ptsa, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
        dmin = jnp.min(d, axis=0, keepdims=True)
        if mode in ("dmin", "dmin_bf16"):
            return (jnp.minimum(best_d, dmin), best_g)
        if mode in ("argf", "fullf"):
            # exact argmin without int select: float iota + penalty fma,
            # f32 min reduce (rows+penalty stays exactly representable:
            # indices < 2^13, penalty 2^24 -> distinct integers in f32)
            # Mosaic has no f32 iota: int iota + convert (round-2 finding)
            rows_f = jax.lax.broadcasted_iota(
                jnp.int32, d.shape, 0).astype(f32)
            cand = rows_f + (d > dmin).astype(f32) * f32(2.0**24)
            arg_f = jnp.min(cand, axis=0, keepdims=True)
            if mode == "argf":
                return (jnp.minimum(best_d, dmin),
                        best_g + arg_f * 1e-30)
            # winner unique by construction (distinct integer cand values;
            # exact ties all get penalty 0 -> lowest row wins): pure-f32
            # onehot, no int iota at all
            onehot = (cand == arg_f).astype(f32)
            g = jax.lax.dot_general(vfeat_t, onehot, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            better = dmin < best_d
            return (jnp.where(better, dmin, best_d),
                    jnp.where(jnp.broadcast_to(better, g.shape), g, best_g))
        else:
            rows = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
            arg = jnp.min(jnp.where(d <= dmin, rows, jnp.int32(2**30)),
                          axis=0, keepdims=True)
        if mode == "jargmin":
            arg2 = jnp.argmin(d, axis=0)[None].astype(jnp.int32)
            return (jnp.minimum(best_d, dmin),
                    best_g + arg2.astype(f32) * 1e-30)
        if mode == "fulln":
            # native argmin (fused Mosaic reduce, first-occurrence ties =
            # torch min semantics) + onehot + gather
            argn = jnp.argmin(d, axis=0)[None].astype(jnp.int32)
            rows = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
            onehot = (rows == argn).astype(f32)
            g = jax.lax.dot_general(vfeat_t, onehot, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            better = dmin < best_d
            return (jnp.where(better, dmin, best_d),
                    jnp.where(jnp.broadcast_to(better, g.shape), g, best_g))
        if mode == "argmin":
            return (jnp.minimum(best_d, dmin),
                    best_g + arg.astype(f32) * 1e-30)
        if mode == "bf16gather":
            onehot = (rows == arg).astype(jnp.bfloat16)
            vb = vfeat_t.astype(jnp.bfloat16)
            vlo = (vfeat_t - vb.astype(f32)).astype(jnp.bfloat16)
            g = jax.lax.dot_general(vb, onehot, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            g = g + jax.lax.dot_general(vlo, onehot, (((1,), (0,)), ((), ())),
                                        preferred_element_type=f32)
        else:  # full
            onehot = (rows == arg).astype(f32)
            g = jax.lax.dot_general(vfeat_t, onehot, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
        better = dmin < best_d
        return (jnp.where(better, dmin, best_d),
                jnp.where(jnp.broadcast_to(better, g.shape), g, best_g))

    init = (jnp.full((1, T), jnp.inf, f32), jnp.zeros((19, T), f32))
    dmin, g = jax.lax.fori_loop(0, n_chunks, body, init)
    out = jnp.concatenate(
        [dmin, g, jnp.zeros((32 - 20, T), f32)], axis=0)
    out_ref[0] = out


@functools.partial(jax.jit, static_argnames=("mode",))
def run_kernel(ptsa, va, vfeat_t, mode):
    Bb = ptsa.shape[0]
    n_chunks, chunk = va.shape[1], va.shape[2]
    Pp = ptsa.shape[2]
    n_tiles = Pp // TILE
    return pl.pallas_call(
        functools.partial(kernel, n_chunks=n_chunks, chunk=chunk, mode=mode),
        grid=(Bb, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 4, TILE), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, chunk, 4), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, 19, chunk), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 32, TILE), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bb, 32, Pp), jnp.float32),
    )(ptsa, va, vfeat_t)


def main():
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    points = jax.random.normal(k1, (B, P, 3))
    vertices = jax.random.normal(k2, (B, V, 3))
    vfeat = jax.random.normal(k3, (B, V, 19))

    # mirror ops.geo packing
    Vp128 = V + (-V) % 128
    n_chunks = max(1, -(-(Vp128 * TILE * 4) // (8 * 2**20)))
    chunk = -(-Vp128 // n_chunks)
    chunk += (-chunk) % 8
    Vp = n_chunks * chunk
    pad_v = Vp - V
    verts_p = jnp.pad(vertices, ((0, 0), (0, pad_v), (0, 0)),
                      constant_values=1e6)
    vsq = 0.5 * jnp.sum(jnp.square(verts_p), axis=-1)[..., None]
    va = jnp.concatenate([verts_p, vsq], axis=-1).reshape(B, n_chunks, chunk, 4)
    vfeat_t = jnp.swapaxes(jnp.pad(vfeat, ((0, 0), (0, pad_v), (0, 0))), 1, 2)
    vfeat_t = vfeat_t.reshape(B, 19, n_chunks, chunk).transpose(0, 2, 1, 3)
    pts_t = jnp.swapaxes(points, 1, 2)
    ptsa = jnp.concatenate([-pts_t, jnp.ones((B, 1, P))], axis=1)

    print(f"B={B} P={P} V={V} chunks={n_chunks} chunk={chunk} tile={TILE}",
          flush=True)

    # correctness spot check: packed / fullf vs full nearest features
    full = run_kernel(ptsa, va, vfeat_t, "full")
    packed = run_kernel(ptsa, va, vfeat_t, "packed")
    g_full = full[:, 1:20, :]
    g_packed = packed[:, 0:19, :]
    match = float(jnp.mean((jnp.abs(g_full - g_packed) < 1e-5).all(axis=1)
                           .astype(jnp.float32)))
    print(f"packed argmin agreement vs full: {match*100:.3f}%", flush=True)
    fulln = run_kernel(ptsa, va, vfeat_t, "fulln")
    match_n = float(jnp.mean(
        (jnp.abs(g_full - fulln[:, 1:20, :]) < 1e-5).all(axis=1)
        .astype(jnp.float32)))
    print(f"fulln argmin agreement vs full: {match_n*100:.3f}%", flush=True)

    for mode in ("dmin", "jargmin", "full", "fulln", "packed1"):
        def st(i, c, mode=mode):
            out = run_kernel(ptsa + c * 1e-30, va, vfeat_t, mode)
            return jnp.sum(out[:, :1, ::64]) * 1e-30

        try:
            per, _ = device_time(st, n1=2, n2=8)
            print(f"{mode:10s}: {per*1e3:7.2f} ms/batch{B}", flush=True)
        except Exception as e:
            print(f"{mode:10s}: FAILED {repr(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
