"""Trainable fused SPADE half-block Pallas kernels (custom VJP).

The G step's synthesis stack runs per-op XLA in training because the
inference kernel (ops/synthesis_kernel.py) folds batch norm from RUNNING
stats — train mode normalizes by differentiable cross-replica BATCH stats
(ref map3d_layers.py:162 nn.SyncBatchNorm), so every half-block has a
global (B,H,W)-reduction barrier that a whole-network pixel-tile kernel
cannot cross.

This module fuses everything BETWEEN those barriers.  The unit is one
"half-block" of a SPADEBlock (ref map3d_layers.py:218-238):

    nhat = (h - m) * r            # batch-stat normalize, (m, r) are ARGS
    u    = nhat * a + b           # BN affine
    s    = u * gamma + beta       # SPADE modulation
    t    = lrelu(s)
    out  = t @ W + c              # spectral-normalized 1x1 conv

with two variants: ``spatial`` (gamma/beta from the per-pixel SPADE MLP
on the style map, ref :176-190) and ``rank1`` (gamma/beta are per-image
rows — global-style blocks; the MLP runs pre-broadcast outside).

Division of labor (the design that keeps the custom VJP small and exact):

  * Batch moments, the cross-replica pmean, running-stat updates, spectral
    norm, skip adds and ToRGB stay in XLA (models/synthesis.py) — all
    tiny or already-fused ops.  (m, r = rsqrt(var+eps)) enter the kernel
    as differentiable ARGUMENTS, so the BN backward-through-moments chain
    is JAX autodiff through the XLA moment computation: the kernel's VJP
    only reports dL/dm and dL/dr (per-channel sums it accumulates anyway)
    and the standard sync-BN coupling falls out exactly.
  * The kernel fuses the normalize/modulate/activate/conv chain per pixel
    tile: forward reads h (+ style) and writes out; backward recomputes
    the forward per tile and emits dh (+ dstyle) tiles plus weight/bias
    cotangents accumulated across the sequential grid in constant-index
    output blocks (the ops/raymarch_bwd.py pattern).

The XLA formulation remains the numerical reference; gradient parity is
pinned by interpret-mode tests (tests/test_synthesis_train.py) at f32
compute where only reduction order differs.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LRELU = lambda x: jnp.maximum(x, 0) + 0.2 * jnp.minimum(x, 0)

_MLP_NAMES = ("sh_w", "sh_b", "g_w", "g_b", "bt_w", "bt_b")


# ---------------------------------------------------------------------------
# VMEM budgeting — tile_rows is computed, not guessed
# ---------------------------------------------------------------------------

# Model budget against the ~16 MB scoped-VMEM compiler limit.  The estimator
# below OVERESTIMATES by ~10-15% (calibrated on v5e: the MAP3DBN backward at
# tile_rows=8/width=128/C=384 measures 16.48 MB scoped vs 18.5 MB estimated),
# so a 14 MB model budget corresponds to ~12.5 MB actual — comfortable
# headroom without throwing away tile size.
_VMEM_BUDGET_BYTES = 14 * 2**20


def _pad_lanes(c: int) -> int:
    return -(-c // 128) * 128


def estimate_half_block_vmem(
    tile_rows: int, width: int, ci: int, cs: int, co: int, hid: int,
    *, spatial: bool, bwd: bool, cdt_bytes: int = 2,
) -> int:
    """Scoped-VMEM bytes for ONE grid step of the half-block kernel.

    Terms (all channel dims padded to the 128-lane width):
      * grid-varying pixel tiles (h/style/g in, dh/dsty/out out) are
        double-buffered by the Pallas pipeline -> x2;
      * resident weights (conv + SPADE MLP, compute dtype) and, in the
        backward, their f32 accumulator output blocks (constant index, so
        single-buffered);
      * live f32 per-pixel temporaries of the compute chain — the forward
        keeps ~2 Ci-wide buffers live (nhat -> u -> s -> t reuse), the
        backward ~5 (nhat, u32, dt/ds/du chain) plus the MLP's hid-wide
        activations.
    """
    P = tile_rows * width
    ci_p, cs_p, co_p, hid_p = map(_pad_lanes, (ci, cs, co, hid))

    io_px = ci_p * cdt_bytes + (cs_p * cdt_bytes if spatial else 0)  # h (+style) in
    if bwd:
        io_px += co_p * cdt_bytes                                    # g in
        io_px += ci_p * cdt_bytes + (cs_p * cdt_bytes if spatial else 0)  # dh (+dsty)
    else:
        io_px += co_p * cdt_bytes                                    # out
    tiles = 2 * io_px * P  # double-buffered

    weights = ci_p * co_p * cdt_bytes
    if spatial:
        weights += (cs_p * hid_p + 2 * hid_p * ci_p) * cdt_bytes
    acc = 0
    if bwd:
        acc = ci_p * co_p * 4
        if spatial:
            acc += (cs_p * hid_p + 2 * hid_p * ci_p) * 4

    live = (5 * ci_p + (2 * hid_p if spatial else 0)) if bwd \
        else (2 * ci_p + (hid_p if spatial else 0))
    temps = live * 4 * P
    return tiles + weights + acc + temps


def auto_tile_rows(
    H: int, width: int, ci: int, cs: int, co: int, hid: int = 128,
    *, spatial: bool = True, cdt_bytes: int = 2, max_rows: int = 16,
    budget: int = _VMEM_BUDGET_BYTES,
) -> int:
    """Largest ``tile_rows`` dividing ``H`` whose forward AND backward
    half-block kernels fit the scoped-VMEM budget.  Replaces the static
    tile_rows=8 default that failed to compile at MAP3DBN stock shapes
    (16.48 MB scoped vs the 16 MB limit)."""
    for t in sorted((t for t in range(1, min(H, max_rows) + 1) if H % t == 0),
                    reverse=True):
        need = max(
            estimate_half_block_vmem(t, width, ci, cs, co, hid,
                                     spatial=spatial, bwd=True,
                                     cdt_bytes=cdt_bytes),
            estimate_half_block_vmem(t, width, ci, cs, co, hid,
                                     spatial=spatial, bwd=False,
                                     cdt_bytes=cdt_bytes),
        )
        if need <= budget:
            return t
    return 1


def _mm(x, w, cdt):
    return jax.lax.dot_general(
        x.astype(cdt), w.astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _mm_t(x, w, cdt):  # x @ w.T
    return jax.lax.dot_general(
        x.astype(cdt), w.astype(cdt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _outer(x, dy, cdt):  # x.T @ dy
    return jax.lax.dot_general(
        x.astype(cdt), dy.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _half_forward(h, m, r, a, b, gam, bet, cdt):
    """Shared forward chain up to the conv input.  Mirrors the XLA op/cast
    order: BN in f32 -> cast cdt -> modulation and lrelu in cdt
    (models/synthesis.py apply_sync_batch_norm + apply_spade2d)."""
    nhat = (h.astype(jnp.float32) - m) * r
    u = (nhat * a + b).astype(cdt)
    s = u * gam.astype(cdt) + bet.astype(cdt)
    t = _LRELU(s)
    return nhat, u, s, t


def _spade_mlp(st, W, cdt):
    """SPADE MLP on a (P, Cs) style tile -> (z0 pre-relu f32, actv cdt,
    gam cdt, bet cdt).  Cast order mirrors apply_conv1x1/apply_spade2d."""
    z0 = _mm(st, W["sh_w"], cdt) + W["sh_b"]
    actv = jnp.maximum(z0, 0.0).astype(cdt)
    gam = (_mm(actv, W["g_w"], cdt) + W["g_b"]).astype(cdt) + 1.0
    bet = (_mm(actv, W["bt_w"], cdt) + W["bt_b"]).astype(cdt)
    return z0, actv, gam, bet


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(*refs, spatial, add_fixed, tile_rows, width, cdt):
    i = 0
    h_ref = refs[i]; i += 1
    if spatial:
        sty_ref = refs[i]; i += 1
        if add_fixed:
            fx_ref = refs[i]; i += 1
    else:
        gam_ref = refs[i]; i += 1
        bet_ref = refs[i]; i += 1
    m_ref, r_ref, a_ref, b_ref = refs[i : i + 4]; i += 4
    if spatial:
        mlp_refs = refs[i : i + 6]; i += 6
        W = dict(zip(_MLP_NAMES, (rf[:] for rf in mlp_refs)))
    w_ref, c_ref = refs[i : i + 2]; i += 2
    out_ref = refs[i]

    P = tile_rows * width
    h = h_ref[0].reshape(P, -1)
    m, r, a, b = m_ref[:], r_ref[:], a_ref[:], b_ref[:]

    if spatial:
        st = sty_ref[0].reshape(P, -1).astype(cdt)
        if add_fixed:
            st = st + fx_ref[0].astype(cdt)
        _, _, gam, bet = _spade_mlp(st, W, cdt)
    else:
        gam = gam_ref[0]
        bet = bet_ref[0]

    _, _, _, t = _half_forward(h, m, r, a, b, gam, bet, cdt)
    out = _mm(t, w_ref[:], cdt) + c_ref[:]
    out_ref[0] = out.reshape(tile_rows, width, -1).astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _bwd_kernel(*refs, spatial, add_fixed, tile_rows, width, cdt):
    f32 = jnp.float32
    i = 0
    h_ref = refs[i]; i += 1
    if spatial:
        sty_ref = refs[i]; i += 1
        if add_fixed:
            fx_ref = refs[i]; i += 1
    else:
        gam_ref = refs[i]; i += 1
        bet_ref = refs[i]; i += 1
    m_ref, r_ref, a_ref, b_ref = refs[i : i + 4]; i += 4
    if spatial:
        mlp_refs = refs[i : i + 6]; i += 6
        W = dict(zip(_MLP_NAMES, (rf[:] for rf in mlp_refs)))
    w_ref, g_ref = refs[i : i + 2]; i += 2
    out_refs = refs[i:]

    names = ["dh", "dw", "dc", "da", "db", "ds1", "ds2"]
    if spatial:
        names += ["dsty", "dsh_w", "dsh_b", "dg_w", "dg_b", "dbt_w", "dbt_b"]
    else:
        names += ["dgam", "dbet"]
    O = dict(zip(names, out_refs))

    b_id = pl.program_id(0)
    t_id = pl.program_id(1)

    # zero global accumulators on the first grid step, per-image ones on
    # each image's first tile (sequential-grid reduction pattern,
    # ops/raymarch_bwd.py:170-178)
    glob = ["dw", "dc", "da", "db", "ds1", "ds2"]
    if spatial:
        glob += ["dsh_w", "dsh_b", "dg_w", "dg_b", "dbt_w", "dbt_b"]

    @pl.when(jnp.logical_and(b_id == 0, t_id == 0))
    def _zero_glob():
        for n in glob:
            O[n][...] = jnp.zeros(O[n].shape, f32)

    if not spatial:
        @pl.when(t_id == 0)
        def _zero_rows():
            O["dgam"][...] = jnp.zeros(O["dgam"].shape, f32)
            O["dbet"][...] = jnp.zeros(O["dbet"].shape, f32)

    def acc(n, v):
        O[n][...] = O[n][...] + v.reshape(O[n].shape)

    P = tile_rows * width
    h = h_ref[0].reshape(P, -1)
    m, r, a, b = m_ref[:], r_ref[:], a_ref[:], b_ref[:]
    g = g_ref[0].reshape(P, -1)

    if spatial:
        st = sty_ref[0].reshape(P, -1).astype(cdt)
        if add_fixed:
            st = st + fx_ref[0].astype(cdt)
        z0, actv, gam, bet = _spade_mlp(st, W, cdt)
    else:
        gam = gam_ref[0]
        bet = bet_ref[0]

    nhat, u, s, t = _half_forward(h, m, r, a, b, gam, bet, cdt)

    # conv
    acc("dw", _outer(t, g, cdt))
    acc("dc", jnp.sum(g.astype(f32), axis=0, keepdims=True))
    dt = _mm_t(g, w_ref[:], cdt)                                   # (P, C) f32

    # lrelu'(s): where on f32 operands (bf16 vector compares do not lower)
    ds = dt * jnp.where(s.astype(f32) >= 0.0, 1.0, 0.2)

    u32 = u.astype(f32)
    if spatial:
        dgam_px = ds * u32
        dbet_px = ds
        acc("dg_w", _outer(actv, dgam_px, cdt))
        acc("dg_b", jnp.sum(dgam_px, axis=0, keepdims=True))
        acc("dbt_w", _outer(actv, dbet_px, cdt))
        acc("dbt_b", jnp.sum(dbet_px, axis=0, keepdims=True))
        dactv = _mm_t(dgam_px, W["g_w"], cdt) + _mm_t(dbet_px, W["bt_w"], cdt)
        dactv = dactv * (z0 > 0.0).astype(f32)
        acc("dsh_w", _outer(st, dactv, cdt))
        acc("dsh_b", jnp.sum(dactv, axis=0, keepdims=True))
        dst = _mm_t(dactv, W["sh_w"], cdt)
        O["dsty"][0] = dst.reshape(tile_rows, width, -1).astype(O["dsty"].dtype)
    else:
        acc("dgam", jnp.sum(ds * u32, axis=0, keepdims=True))
        acc("dbet", jnp.sum(ds, axis=0, keepdims=True))

    du = ds * gam.astype(f32)
    acc("da", jnp.sum(du * nhat, axis=0, keepdims=True))
    acc("db", jnp.sum(du, axis=0, keepdims=True))
    dnhat = du * a
    acc("ds1", jnp.sum(dnhat, axis=0, keepdims=True))
    acc("ds2", jnp.sum(dnhat * nhat, axis=0, keepdims=True))
    O["dh"][0] = (dnhat * r).reshape(tile_rows, width, -1).astype(O["dh"].dtype)


# ---------------------------------------------------------------------------
# custom-VJP wrappers
# ---------------------------------------------------------------------------


def _row_specs(C):
    return pl.BlockSpec((1, C), lambda bb, tt: (0, 0), memory_space=pltpu.VMEM)


def _tile_spec(tile_rows, width, C):
    return pl.BlockSpec((1, tile_rows, width, C), lambda bb, tt: (bb, tt, 0, 0),
                        memory_space=pltpu.VMEM)


def _whole(arr_shape):
    nd = len(arr_shape)
    return pl.BlockSpec(arr_shape, (lambda n: lambda bb, tt: (0,) * n)(nd),
                        memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _make_half_block(spatial, add_fixed, tile_rows, cdt, interpret):
    f32 = jnp.float32

    def _grid(h):
        B, H, Wd, _ = h.shape
        assert H % tile_rows == 0, (H, tile_rows)
        return (B, H // tile_rows), Wd

    def _common_inputs(h, style, fixed, gam, bet, m, r, a, b, mlp):
        (B, n_t), Wd = _grid(h)
        Ci = h.shape[-1]
        specs = [_tile_spec(tile_rows, Wd, Ci)]
        args = [h]
        if spatial:
            Cs = style.shape[-1]
            specs.append(_tile_spec(tile_rows, Wd, Cs))
            args.append(style)
            if add_fixed:
                specs.append(pl.BlockSpec((1, 1, Cs), lambda bb, tt: (bb, 0, 0),
                                          memory_space=pltpu.VMEM))
                args.append(fixed.reshape(B, 1, Cs).astype(cdt))
        else:
            row = pl.BlockSpec((1, 1, Ci), lambda bb, tt: (bb, 0, 0),
                               memory_space=pltpu.VMEM)
            specs += [row, row]
            args += [gam.reshape(B, 1, Ci).astype(cdt),
                     bet.reshape(B, 1, Ci).astype(cdt)]
        specs += [_row_specs(Ci)] * 4
        args += [m.reshape(1, Ci).astype(f32), r.reshape(1, Ci).astype(f32),
                 a.reshape(1, Ci).astype(f32), b.reshape(1, Ci).astype(f32)]
        if spatial:
            for n in _MLP_NAMES:
                warr = mlp[n]
                warr = (warr.astype(cdt) if n.endswith("_w")
                        else warr.reshape(1, -1).astype(f32))
                specs.append(_whole(warr.shape))
                args.append(warr)
        return (B, n_t), Wd, specs, args

    def fwd_impl(h, style, fixed, gam, bet, m, r, a, b, mlp, w, c):
        (B, n_t), Wd, specs, args = _common_inputs(
            h, style, fixed, gam, bet, m, r, a, b, mlp)
        Ci = h.shape[-1]
        Co = w.shape[-1]
        specs += [_whole(w.shape), _row_specs(Co)]
        args += [w.astype(cdt), c.reshape(1, Co).astype(f32)]
        H = h.shape[1]
        kernel = functools.partial(
            _fwd_kernel, spatial=spatial, add_fixed=add_fixed,
            tile_rows=tile_rows, width=Wd, cdt=cdt)
        n_px = B * H * Wd
        flops = n_px * 2 * Ci * Co
        if spatial:
            Cs = style.shape[-1]
            hid = mlp["sh_w"].shape[-1]
            flops += n_px * 2 * (Cs * hid + 2 * hid * Ci)
        return pl.pallas_call(
            kernel,
            grid=(B, n_t),
            in_specs=specs,
            out_specs=_tile_spec(tile_rows, Wd, Co),
            out_shape=jax.ShapeDtypeStruct((B, H, Wd, Co), cdt),
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=n_px * (Ci + Co) * 2,
                transcendentals=0),
            interpret=interpret,
        )(*args)

    def bwd_impl(h, style, fixed, gam, bet, m, r, a, b, mlp, w, g):
        (B, n_t), Wd, specs, args = _common_inputs(
            h, style, fixed, gam, bet, m, r, a, b, mlp)
        Ci = h.shape[-1]
        Co = w.shape[-1]
        H = h.shape[1]
        specs += [_whole(w.shape), _tile_spec(tile_rows, Wd, Co)]
        args += [w.astype(cdt), g]

        row_acc = lambda C: (pl.BlockSpec((1, C), lambda bb, tt: (0, 0),
                                          memory_space=pltpu.VMEM),
                             jax.ShapeDtypeStruct((1, C), f32))
        out_specs = [_tile_spec(tile_rows, Wd, Ci)]
        out_shapes = [jax.ShapeDtypeStruct((B, H, Wd, Ci), h.dtype)]
        out_specs.append(_whole(w.shape))
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, f32))
        for C in (Co, Ci, Ci, Ci, Ci):  # dc, da, db, ds1, ds2
            sp, sh = row_acc(C)
            out_specs.append(sp); out_shapes.append(sh)
        if spatial:
            Cs = style.shape[-1]
            hid = mlp["sh_w"].shape[-1]
            out_specs.append(_tile_spec(tile_rows, Wd, Cs))
            out_shapes.append(jax.ShapeDtypeStruct((B, H, Wd, Cs), style.dtype))
            for shape in ((Cs, hid), (1, hid), (hid, Ci), (1, Ci),
                          (hid, Ci), (1, Ci)):
                if len(shape) == 2 and shape[0] != 1:
                    out_specs.append(_whole(shape))
                else:
                    sp, _ = row_acc(shape[1])
                    out_specs.append(sp)
                out_shapes.append(jax.ShapeDtypeStruct(shape, f32))
        else:
            row_b = pl.BlockSpec((1, 1, Ci), lambda bb, tt: (bb, 0, 0),
                                 memory_space=pltpu.VMEM)
            out_specs += [row_b, row_b]
            out_shapes += [jax.ShapeDtypeStruct((B, 1, Ci), f32)] * 2

        kernel = functools.partial(
            _bwd_kernel, spatial=spatial, add_fixed=add_fixed,
            tile_rows=tile_rows, width=Wd, cdt=cdt)
        n_px = B * H * Wd
        flops = n_px * 2 * Ci * Co * 3
        if spatial:
            hid = mlp["sh_w"].shape[-1]
            flops += n_px * 2 * (style.shape[-1] * hid + 2 * hid * Ci) * 3
        return pl.pallas_call(
            kernel,
            grid=(B, n_t),
            in_specs=specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=n_px * (2 * Ci + Co) * 2,
                transcendentals=0),
            interpret=interpret,
        )(*args)

    @jax.custom_vjp
    def half_block(h, style, fixed, gam, bet, m, r, a, b, mlp, w, c):
        return fwd_impl(h, style, fixed, gam, bet, m, r, a, b, mlp, w, c)

    def fwd_rule(h, style, fixed, gam, bet, m, r, a, b, mlp, w, c):
        out = fwd_impl(h, style, fixed, gam, bet, m, r, a, b, mlp, w, c)
        return out, (h, style, fixed, gam, bet, m, r, a, b, mlp, w)

    def bwd_rule(res, g):
        h, style, fixed, gam, bet, m, r, a, b, mlp, w = res
        outs = bwd_impl(h, style, fixed, gam, bet, m, r, a, b, mlp, w, g)
        dh, dw, dc, da, db, ds1, ds2 = outs[:7]
        r32 = r.astype(jnp.float32).reshape(-1)
        dm = (-r32 * ds1[0]).astype(m.dtype).reshape(m.shape)
        dr = (ds2[0] / r32).astype(r.dtype).reshape(r.shape)
        da = da[0].reshape(a.shape)
        db = db[0].reshape(b.shape)
        dc = dc[0]
        if spatial:
            dsty = outs[7]
            dmlp = {
                "sh_w": outs[8], "sh_b": outs[9][0].reshape(mlp["sh_b"].shape),
                "g_w": outs[10], "g_b": outs[11][0].reshape(mlp["g_b"].shape),
                "bt_w": outs[12], "bt_b": outs[13][0].reshape(mlp["bt_b"].shape),
            }
            dfixed = (jnp.sum(dsty.astype(jnp.float32), axis=(1, 2))
                      .reshape(fixed.shape).astype(fixed.dtype)
                      if add_fixed else None)
            dgam = dbet = None
        else:
            dsty = None
            dmlp = None
            dfixed = None
            dgam = outs[7].reshape(gam.shape).astype(gam.dtype)
            dbet = outs[8].reshape(bet.shape).astype(bet.dtype)
        return (dh, dsty, dfixed, dgam, dbet, dm, dr, da, db, dmlp, dw, dc)

    half_block.defvjp(fwd_rule, bwd_rule)
    return half_block


def spade_half_block_spatial(
    h: jax.Array,              # (B, H, W, Ci) compute-dtype activations
    style: jax.Array,          # (B, H, W, Cs) spatial style map
    fixed: Optional[jax.Array],  # (B, Cs) per-image row added to style, or None
    m: jax.Array,              # (Ci,) batch mean (differentiable)
    r: jax.Array,              # (Ci,) rsqrt(var + eps) (differentiable)
    a: jax.Array,              # (Ci,) BN affine scale
    b: jax.Array,              # (Ci,) BN affine bias
    mlp: Dict[str, jax.Array],  # {sh_w, sh_b, g_w, g_b, bt_w, bt_b}
    w: jax.Array,              # (Ci, Co) spectral-normalized conv weight
    c: jax.Array,              # (Co,) conv bias
    tile_rows: Optional[int] = None,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Fused norm+SPADE+lrelu+conv with per-pixel gamma/beta from the MLP.

    ``tile_rows=None`` (the default) sizes the pixel tile from the
    scoped-VMEM model (auto_tile_rows) instead of a static guess.
    Differentiable in every tensor argument (see module docstring for the
    m/r moment-chain contract)."""
    if tile_rows is None:
        tile_rows = auto_tile_rows(
            h.shape[1], h.shape[2], h.shape[3], style.shape[3], w.shape[1],
            mlp["sh_w"].shape[1], spatial=True,
            cdt_bytes=jnp.dtype(compute_dtype).itemsize)
    fn = _make_half_block(True, fixed is not None, tile_rows, compute_dtype,
                          interpret)
    return fn(h, style, fixed, None, None, m, r, a, b, mlp, w, c)


def spade_half_block_rank1(
    h: jax.Array,              # (B, H, W, Ci)
    gam: jax.Array,            # (B, Ci) per-image gamma rows (1 + MLP out)
    bet: jax.Array,            # (B, Ci) per-image beta rows
    m: jax.Array,
    r: jax.Array,
    a: jax.Array,
    b: jax.Array,
    w: jax.Array,
    c: jax.Array,
    tile_rows: Optional[int] = None,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Fused half-block for global-style blocks: gamma/beta are per-image
    rows computed (differentiably) outside from the fixed style.
    ``tile_rows=None`` auto-sizes from the scoped-VMEM model."""
    if tile_rows is None:
        tile_rows = auto_tile_rows(
            h.shape[1], h.shape[2], h.shape[3], 0, w.shape[1], 0,
            spatial=False, cdt_bytes=jnp.dtype(compute_dtype).itemsize)
    fn = _make_half_block(False, False, tile_rows, compute_dtype, interpret)
    return fn(h, None, None, gam, bet, m, r, a, b, None, w, c)
