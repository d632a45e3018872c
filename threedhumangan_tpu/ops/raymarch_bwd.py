"""Pallas BACKWARD kernel for the fused FiLM-SIREN ray-march.

The trainable wrapper's default backward rematerializes through the XLA
formulation (ops/raymarch._xla_packed_render): a full HBM-resident field
forward plus an XLA backward — the G step's largest cost.  This kernel
runs the whole VJP in VMEM per (batch, ray-tile) program:

  Phase A (ascending fori_loop over steps): recompute the SIREN per step
    and build per-ray tables alpha/T/w/sigma/(f·g) as (TILE_R, S) arrays
    via one-hot lane accumulation (Mosaic cannot dynamic-update values —
    `tab += col * (lane_iota == s)` is the portable store).
  Table algebra: composite-weight cotangents gw_s, transmittance suffix
    sums A_s = sum_{t>s} gw_t w_t as ONE (TILE_R,S)x(S,S) upper-triangular
    matmul (no reverse scan), then dalpha -> dsigma.
  Phase B (ascending fori_loop): recompute per-step activations and
    backprop the MLP — weight cotangents are (in,out) dot_generals on the
    MXU, accumulated across steps in the loop carry and across the
    sequential grid in constant-index output blocks.

Gradients are produced for the SIREN weights and the per-sample
freq/phase conditioning ONLY.  The packed inputs (points/geo/dirs/noise)
and z samples are no-grad data in this framework (the reference computes
them under torch.no_grad, lib/generators/map3d_generator.py:408-426), so
their cotangents are returned as zeros by the custom-VJP wrapper.

Gradient parity: the backward math mirrors JAX autodiff of the XLA chain
exactly — including `fast_sin`'s polynomial derivative (`fast_sin_grad`
differentiates the degree-9 polynomial term-by-term; round(k) is locally
constant, as autodiff sees it) — pinned by an interpret-mode test against
``jax.grad`` of ``_xla_packed_render``.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from threedhumangan_tpu.ops.raymarch import (
    INPUT_PACK,
    _flatten_field_params,
    fast_sin,
)


def fast_sin_grad(x):
    """Exact derivative of ``fast_sin`` (term-by-term polynomial
    derivative; the range-reduction offset k is piecewise constant)."""
    inv_pi = 0.3183098861837907
    k = jnp.round(x * inv_pi)
    y = x - k * jnp.pi
    y2 = y * y
    q = 1.0 + y2 * (-1.0 / 2.0 + y2 * (1.0 / 24.0 + y2 * (-1.0 / 720.0 + y2 * (1.0 / 40320.0))))
    sign = 1.0 - 2.0 * (k - 2.0 * jnp.floor(k * 0.5))
    return q * sign


def _grad_names(weight_names, n_blocks):
    """Deterministic output ordering: weight grads then freq/phase."""
    return list(weight_names) + ["freq", "phase"]


def _raymarch_bwd_kernel(
    packed_ref, freq_ref, phase_ref, z_ref, go_ref, gd_ref,
    *rest_refs,
    weight_names, hidden_dim, geo_dim, tile_rays, num_steps,
    white_back, last_back, compute_dtype, exact_sin, with_noise,
):
    n_w = len(weight_names)
    weight_refs = rest_refs[:n_w]
    out_refs = rest_refs[n_w:]
    weights = {n: r[:] for n, r in zip(weight_names, weight_refs)}
    S = num_steps
    R = tile_rays
    f32 = jnp.float32
    _sin = jnp.sin if exact_sin else fast_sin
    _sin_g = jnp.cos if exact_sin else fast_sin_grad

    z = z_ref[0]          # (R, S)
    freq = freq_ref[0]    # (NB, H)
    phase = phase_ref[0]
    go = go_ref[0]        # (R, F+3)
    gd = gd_ref[0]        # (R, 1)

    n_blocks = len([k for k in weight_names if k.startswith("w_net")])

    def mm(x, w):
        return jax.lax.dot_general(
            x.astype(compute_dtype), w.astype(compute_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=f32)

    def mm_t(x, w):
        # x @ w.T : (R, out) x (in, out) -> (R, in)
        return jax.lax.dot_general(
            x.astype(compute_dtype), w.astype(compute_dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=f32)

    def outer(x, dy):
        # x^T dy : (R, in) x (R, out) -> (in, out)
        return jax.lax.dot_general(
            x.astype(compute_dtype), dy.astype(compute_dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=f32)

    def slab_parts(s):
        slab = packed_ref[0, s]  # (R, C)
        pts = slab[:, :3]
        geo = slab[:, 3 : 3 + geo_dim]
        dirs = slab[:, 3 + geo_dim : 3 + geo_dim + 3]
        noise = (slab[:, 3 + geo_dim + 3 : 3 + geo_dim + 4]
                 if with_noise else None)
        return pts, geo, dirs, noise

    def forward_acts(s):
        """Recompute the per-step SIREN keeping every activation."""
        pts, geo, dirs, noise = slab_parts(s)
        u1 = mm(pts, weights["w_coord"]) + weights["b_coord"]
        x1 = _sin(30.0 * u1)
        u2 = mm(geo, weights["w_geo"]) + weights["b_geo"]
        x2 = _sin(30.0 * u2)
        x = jnp.concatenate([x1, x2], axis=-1)
        xs = [x]
        pres = []
        vs = []
        for i in range(n_blocks):
            f = freq[i : i + 1, :]
            p = phase[i : i + 1, :]
            v = mm(x, weights[f"w_net{i}"]) + weights[f"b_net{i}"]
            pre = f * v + p
            x = _sin(pre)
            vs.append(v)
            pres.append(pre)
            xs.append(x)
        sigma = mm(x, weights["w_sigma"]) + weights["b_sigma"]
        if noise is not None:
            sigma = sigma + noise.astype(f32)
        xc_in = jnp.concatenate([dirs.astype(x.dtype), x], axis=-1)
        fl = freq[n_blocks - 1 : n_blocks, :]
        p_l = phase[n_blocks - 1 : n_blocks, :]
        vc = mm(xc_in, weights["w_color"]) + weights["b_color"]
        prec = fl * vc + p_l
        xc = _sin(prec)
        rgb = jax.nn.sigmoid(mm(xc, weights["w_rgb"]) + weights["b_rgb"])
        feat = mm(xc, weights["w_feat"]) + weights["b_feat"]
        field = jnp.concatenate([rgb, feat], axis=-1)
        return dict(pts=pts, geo=geo, u1=u1, u2=u2, xs=xs, pres=pres, vs=vs,
                    xc_in=xc_in, vc=vc, prec=prec, xc=xc, rgb=rgb,
                    field=field, sigma=sigma)

    lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)

    # ---- Phase A: tables via one-hot accumulation -------------------------
    # The four (R, S) per-step tables are PACKED into one (R, 4S) array:
    # Mosaic miscompiles (compiler subprocess crash) a fori_loop whose body
    # holds the full SIREN when the carry is a tuple of several
    # mixed-shape arrays; a 2-array carry with lane-offset one-hot stores
    # is equivalent and compiles.  Layout: [g | a | t | sig] blocks of S.
    lane_4s = jax.lax.broadcasted_iota(jnp.int32, (1, 4 * S), 1)

    def phase_a(s, carry):
        T_run, tab = carry
        acts = forward_acts(s)
        sigma = acts["sigma"]                      # (R, 1)
        onehot = (lane_s == s).astype(f32)         # (1, S)
        z_s = jnp.sum(z * onehot, axis=1, keepdims=True)
        z_n_oh = (lane_s == jnp.minimum(s + 1, S - 1)).astype(f32)
        z_n = jnp.sum(z * z_n_oh, axis=1, keepdims=True)
        delta = jnp.where(s == S - 1, 1e9, z_n - z_s)
        alpha = 1.0 - jnp.exp(-delta * jnp.maximum(sigma, 0.0))
        gdot = jnp.sum(go * acts["field"], axis=1, keepdims=True)  # (R,1)
        upd = (gdot * (lane_4s == s).astype(f32)
               + alpha * (lane_4s == S + s).astype(f32)
               + T_run * (lane_4s == 2 * S + s).astype(f32)
               + sigma * (lane_4s == 3 * S + s).astype(f32))
        T_run = T_run * (1.0 - alpha + 1e-12)
        return T_run, tab + upd

    T_run, tab = jax.lax.fori_loop(
        0, S, phase_a, (jnp.ones((R, 1), f32), jnp.zeros((R, 4 * S), f32)))
    g_tab = tab[:, 0 * S : 1 * S]
    a_tab = tab[:, 1 * S : 2 * S]
    t_tab = tab[:, 2 * S : 3 * S]
    s_tab = tab[:, 3 * S : 4 * S]

    # ---- table algebra ----------------------------------------------------
    w_tab = t_tab * a_tab                                  # (R, S)
    w_total = jnp.sum(w_tab, axis=1, keepdims=True)
    residual = 1.0 - w_total
    z_l = z[:, S - 1 : S]
    g_l = g_tab[:, S - 1 : S]
    go_sum = jnp.sum(go, axis=1, keepdims=True)

    r_dot = jnp.zeros_like(go_sum)
    if white_back:
        r_dot = r_dot + go_sum
    if last_back:
        r_dot = r_dot + g_l
    C = r_dot + gd * z_l                                   # (R, 1)

    gw_tab = g_tab + z * gd - C                            # (R, S)

    # Transmittance term WITHOUT division.  The naive form
    # A_s/(1-alpha_s+eps) is 0/0 for saturated rays: XLA's algebraic
    # simplifier (allowed by --xla_allow_excess_precision) reassociates
    # (1.0 - a) + 1e-12 into (1.0 + 1e-12) - a == 1.0 - a, so the epsilon
    # vanishes and alpha==1 divides by exact zero.  Instead compute the
    # exclusive product by a descending recurrence:
    #   M_{S-1} = 0;  M_s = gw_{s+1} a_{s+1} + (1 - a_{s+1} + eps) M_{s+1}
    #   dalpha_s = T_s (gw_s - M_s)
    def m_body(j, carry):
        m_run, m_tab = carry
        s = S - 2 - j
        oh_n = (lane_s == s + 1).astype(f32)
        gw_n = jnp.sum(gw_tab * oh_n, axis=1, keepdims=True)
        a_n = jnp.sum(a_tab * oh_n, axis=1, keepdims=True)
        m_run = gw_n * a_n + (1.0 - a_n + 1e-12) * m_run
        oh_s = (lane_s == s).astype(f32)
        m_tab = m_tab + m_run * oh_s
        return m_run, m_tab

    _, m_tab = jax.lax.fori_loop(
        0, S - 1, m_body, (jnp.zeros((R, 1), f32), jnp.zeros((R, S), f32)))

    da_tab = t_tab * (gw_tab - m_tab)
    delta_tab = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full((R, 1), 1e9, f32)], axis=1)
    ds_tab = (da_tab * delta_tab * (1.0 - a_tab)
              * (s_tab > 0.0).astype(f32))                 # (R, S)

    # dL/dfield_s coefficient: w_s, plus residual routed to the last step
    # when last_back (out uses w_l + residual there)
    coef_tab = w_tab
    if last_back:
        last_oh = (lane_s == S - 1).astype(f32)
        coef_tab = coef_tab + residual * last_oh

    # ---- Phase B: per-step backprop, accumulating straight into the
    # grid-shared output refs (same Mosaic multi-carry limitation as
    # Phase A: a dict carry of ~22 grad arrays under this body crashes
    # the compiler; ref read-modify-write inside the loop does not) -----
    b_id = pl.program_id(0)
    t_id = pl.program_id(1)
    names_out = _grad_names(weight_names, n_blocks)
    ref_map = dict(zip(names_out, out_refs))

    # zero the shared accumulators at their first visiting program
    @pl.when(jnp.logical_and(b_id == 0, t_id == 0))
    def _zero_weight_grads():
        for n in weight_names:
            ref_map[n][...] = jnp.zeros(ref_map[n].shape, f32)

    @pl.when(t_id == 0)
    def _zero_cond_grads():
        ref_map["freq"][...] = jnp.zeros(ref_map["freq"].shape, f32)
        ref_map["phase"][...] = jnp.zeros(ref_map["phase"].shape, f32)

    class _RefGrads:
        """dict-like view accumulating into the output refs."""

        def __getitem__(self, n):
            if n in ("freq", "phase"):
                return ref_map[n][0]
            return ref_map[n][...]

        def __setitem__(self, n, val):
            if n in ("freq", "phase"):
                ref_map[n][...] = val[None]
            else:
                ref_map[n][...] = val

    def phase_b(s, grads):
        acts = forward_acts(s)
        onehot = (lane_s == s).astype(f32)
        coef = jnp.sum(coef_tab * onehot, axis=1, keepdims=True)   # (R,1)
        dsig = jnp.sum(ds_tab * onehot, axis=1, keepdims=True)

        dfield = coef * go                                          # (R, F+3)
        drgb = dfield[:, :3]
        dfeat = dfield[:, 3:]

        xc = acts["xc"]
        grads["w_feat"] = grads["w_feat"] + outer(xc, dfeat)
        grads["b_feat"] = grads["b_feat"] + jnp.sum(dfeat, axis=0, keepdims=True)
        dxc = mm_t(dfeat, weights["w_feat"])

        rgb = acts["rgb"]
        dpre_r = drgb * rgb * (1.0 - rgb)
        grads["w_rgb"] = grads["w_rgb"] + outer(xc, dpre_r)
        grads["b_rgb"] = grads["b_rgb"] + jnp.sum(dpre_r, axis=0, keepdims=True)
        dxc = dxc + mm_t(dpre_r, weights["w_rgb"])

        fl = freq[n_blocks - 1 : n_blocks, :]
        dprec = dxc * _sin_g(acts["prec"])
        lf = jnp.sum(dprec * acts["vc"], axis=0, keepdims=True)     # (1, H)
        lp = jnp.sum(dprec, axis=0, keepdims=True)
        last_oh_b = (jax.lax.broadcasted_iota(
            jnp.int32, (n_blocks, 1), 0) == n_blocks - 1).astype(f32)
        grads["freq"] = grads["freq"] + last_oh_b * lf
        grads["phase"] = grads["phase"] + last_oh_b * lp
        dvc = dprec * fl
        grads["w_color"] = grads["w_color"] + outer(acts["xc_in"], dvc)
        grads["b_color"] = grads["b_color"] + jnp.sum(dvc, axis=0, keepdims=True)
        dxc_in = mm_t(dvc, weights["w_color"])
        dx = dxc_in[:, 3:]                                          # (R, H)

        grads["w_sigma"] = grads["w_sigma"] + outer(acts["xs"][-1], dsig)
        grads["b_sigma"] = grads["b_sigma"] + jnp.sum(dsig, axis=0, keepdims=True)
        dx = dx + mm_t(dsig, weights["w_sigma"])

        for i in range(n_blocks - 1, -1, -1):
            f = freq[i : i + 1, :]
            dpre = dx * _sin_g(acts["pres"][i])
            oh = (jax.lax.broadcasted_iota(
                jnp.int32, (n_blocks, 1), 0) == i).astype(f32)
            grads["freq"] = grads["freq"] + oh * jnp.sum(
                dpre * acts["vs"][i], axis=0, keepdims=True)
            grads["phase"] = grads["phase"] + oh * jnp.sum(
                dpre, axis=0, keepdims=True)
            dv = dpre * f
            grads[f"w_net{i}"] = grads[f"w_net{i}"] + outer(acts["xs"][i], dv)
            grads[f"b_net{i}"] = grads[f"b_net{i}"] + jnp.sum(
                dv, axis=0, keepdims=True)
            dx = mm_t(dv, weights[f"w_net{i}"])

        dx1 = dx[:, :hidden_dim]
        dx2 = dx[:, hidden_dim:]
        du1 = dx1 * _sin_g(30.0 * acts["u1"]) * 30.0
        du2 = dx2 * _sin_g(30.0 * acts["u2"]) * 30.0
        grads["w_coord"] = grads["w_coord"] + outer(acts["pts"], du1)
        grads["b_coord"] = grads["b_coord"] + jnp.sum(du1, axis=0, keepdims=True)
        grads["w_geo"] = grads["w_geo"] + outer(acts["geo"], du2)
        grads["b_geo"] = grads["b_geo"] + jnp.sum(du2, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, S, lambda s, c: phase_b(s, _RefGrads()), 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "tile_rays", "white_back", "last_back",
                     "compute_dtype", "interpret", "exact_sin"),
)
def fused_field_render_bwd(
    field_params: Dict,
    packed_inputs: jax.Array,   # (B, R*S, 37[+1]) ray-major
    freq: jax.Array,            # (B, NB*H) raw
    phase: jax.Array,
    z_vals: jax.Array,          # (B, R, S)
    g_out: jax.Array,           # (B, R, F+3) cotangent of rendered output
    g_depth: jax.Array,         # (B, R, 1) cotangent of depth
    num_steps: int,
    tile_rays: int = 64,
    white_back: bool = False,
    last_back: bool = False,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    exact_sin: bool = False,
) -> Tuple[Dict, jax.Array, jax.Array]:
    """VJP of ``fused_field_render`` w.r.t. (field_params, freq, phase).

    Returns (d_field_params pytree, d_freq (B, NB*H), d_phase (B, NB*H)).
    """
    B, P, n_cols = packed_inputs.shape
    with_noise = n_cols == INPUT_PACK + 1
    R = P // num_steps
    assert R % tile_rays == 0, (R, tile_rays)
    n_tiles = R // tile_rays

    weights = _flatten_field_params(field_params)
    names = tuple(sorted(weights))
    hidden_dim = weights["w_coord"].shape[1]
    geo_dim = weights["w_geo"].shape[0]
    n_blocks = len(field_params["network"])
    weights_c = {
        n: (w.astype(compute_dtype) if n.startswith("w_") else w.astype(jnp.float32))
        for n, w in weights.items()
    }

    packed_sm = packed_inputs.reshape(B, R, num_steps, n_cols).transpose(0, 2, 1, 3)
    freq_r = (freq * 15.0 + 30.0).reshape(B, n_blocks, hidden_dim)
    phase_r = phase.reshape(B, n_blocks, hidden_dim)

    kernel = functools.partial(
        _raymarch_bwd_kernel,
        weight_names=names, hidden_dim=hidden_dim, geo_dim=geo_dim,
        tile_rays=tile_rays, num_steps=num_steps, white_back=white_back,
        last_back=last_back, compute_dtype=compute_dtype,
        exact_sin=exact_sin, with_noise=with_noise)

    grid = (B, n_tiles)
    feature_p3 = weights["w_feat"].shape[1] + 3

    in_specs = [
        pl.BlockSpec((1, num_steps, tile_rays, n_cols), lambda b, t: (b, 0, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_blocks, hidden_dim), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_blocks, hidden_dim), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_rays, num_steps), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_rays, feature_p3), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_rays, 1), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in names]

    out_specs = []
    out_shapes = []
    for n in _grad_names(names, n_blocks):
        if n in ("freq", "phase"):
            out_specs.append(pl.BlockSpec(
                (1, n_blocks, hidden_dim), lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct(
                (B, n_blocks, hidden_dim), jnp.float32))
        else:
            shp = weights[n].shape
            out_specs.append(pl.BlockSpec(
                shp, (lambda nd: (lambda b, t: (0,) * nd))(len(shp)),
                memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct(shp, jnp.float32))

    flops_per_pt = 3 * 2 * hidden_dim * (
        3 + geo_dim + 2 * hidden_dim + 3 * hidden_dim + hidden_dim + 3
        + feature_p3 - 3 + 1)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=B * P * flops_per_pt,
            bytes_accessed=2 * B * P * n_cols * 4,
            transcendentals=B * P * 12 * hidden_dim,
        ),
        interpret=interpret,
    )(packed_sm, freq_r, phase_r, z_vals,
      g_out.astype(jnp.float32), g_depth.astype(jnp.float32),
      *[weights_c[n] for n in names])

    grad_flat = dict(zip(_grad_names(names, n_blocks), outs))

    # flat grads -> the models.siren param pytree
    d_params = {
        "first_coord": {"w": grad_flat["w_coord"], "b": grad_flat["b_coord"][0]},
        "first_mod": {"w": grad_flat["w_geo"], "b": grad_flat["b_geo"][0]},
        "sigma": {"w": grad_flat["w_sigma"], "b": grad_flat["b_sigma"][0]},
        "color_sine": {"w": grad_flat["w_color"], "b": grad_flat["b_color"][0]},
        "color_linear": {"w": grad_flat["w_rgb"], "b": grad_flat["b_rgb"][0]},
        "feature_linear": {"w": grad_flat["w_feat"], "b": grad_flat["b_feat"][0]},
        "network": [
            {"w": grad_flat[f"w_net{i}"], "b": grad_flat[f"b_net{i}"][0]}
            for i in range(n_blocks)
        ],
    }

    # chain rule through the host-side conditioning transform
    # freq_kernel = freq*15 + 30  =>  d_freq = 15 * d(freq_kernel)
    d_freq = 15.0 * grad_flat["freq"].reshape(B, n_blocks * hidden_dim)
    d_phase = grad_flat["phase"].reshape(B, n_blocks * hidden_dim)
    return d_params, d_freq, d_phase
