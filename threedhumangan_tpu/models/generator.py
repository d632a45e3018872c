"""Map3DGenerator: 3D pose-mapping field + volume render + 2D synthesis.

Behavioural parity with reference ``lib/generators/map3d_generator.py``
(Map3DGenerator :101-523):
  forward        (ref :208-280)
  staged_forward (ref :282-378) — truncation, depth map.  The reference's
      per-sample ``max_points=50000`` chunking loop (:433-444) exists to fit
      GPU memory; on TPU the field is evaluated as one tiled matmul pass and
      XLA handles scheduling, so ``staged`` only toggles truncation + depth
      outputs, not chunking.
  render         (ref :381-523)
  generate_avg_latent (ref :182-194)

Everything is functional: ``init_generator(key, meta) -> (params, state)``
and ``generator_forward(params, state, z, conditions, rng, meta, ...)``.
``meta`` is the plain config dict (static under jit).  Images are NHWC.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from threedhumangan_tpu.models import synthesis as syn
from threedhumangan_tpu.models import volume_rendering as vr
from threedhumangan_tpu.models.mapping import (
    apply_mapping_network,
    apply_two_part_mapping_network,
    init_mapping_network,
    init_two_part_mapping_network,
)
from threedhumangan_tpu.models.siren import NEURAL_FIELD_REGISTRY
from threedhumangan_tpu.models.smpl import get_geo_features


def _is_zero(x) -> bool:
    """True only for a *static* zero noise level (lets eval paths skip the
    RNG draw entirely); traced scalars return False."""
    return isinstance(x, (int, float)) and x == 0


# flip point for auto_remat_synthesis, in bytes of estimated no-remat
# synthesis residuals.  Calibrated on v5e (15.75 GB usable HBM): the
# largest configuration MEASURED to run without remat is MAP3DBN512
# batch 8 (~9.7 GB of residuals by the model below); MAP3DBN512L batch 8
# (~15.9 GB) and MAP3DBN batch 32 (~14.5 GB) both exceed HBM outright
# (XLA reports 20.6 G used).  10 GB keeps the known-good point no-remat
# while flipping everything at or beyond the known-bad ones.
_AUTO_REMAT_RESIDUAL_BUDGET = 10 * 2**30


def auto_remat_synthesis(meta: Dict, micro_batch: int) -> bool:
    """Shape-aware default for ``remat_synthesis``.

    Without rematerialization the G-step backward holds ~2 residual
    activation maps per SPADE block (each trainable half-block kernel
    saves its input h — ops/synthesis_train.py), i.e. about

        2 * synthesis_blocks * B * gen_h * gen_w * hidden  (bf16)

    bytes alive across the backward.  A flat default cannot serve both
    MAP3DBN at batch 8 (3.6 GB — measurably faster without remat) and
    MAP3DBN512L (15.9 GB — does not fit 16 GB HBM at all), so trainers
    and benches call this with the per-device micro-batch
    (batch // batch_split) unless the config pins ``remat_synthesis``
    explicitly."""
    blocks = meta.get("synthesis_blocks", 9)
    residual_bytes = (2 * blocks * micro_batch * meta["gen_height"]
                      * meta["gen_width"] * meta["hidden_dim"] * 2)
    return residual_bytes > _AUTO_REMAT_RESIDUAL_BUDGET


def init_generator(key, meta: Dict) -> Tuple[Dict, Dict]:
    """Build all generator params (ref Map3DGenerator.__init__ :103-173)."""
    keys = jax.random.split(key, 6)
    latent_dim = meta["latent_dim"]
    hidden_dim = meta["hidden_dim"]
    feature_dim = meta["feature_dim"]

    field_init, _ = NEURAL_FIELD_REGISTRY[meta["neural_field_cls"]]
    params = {}
    state = {}

    params["neural_field"] = field_init(
        keys[0],
        input_dim=meta["input_dim"],
        hidden_dim=hidden_dim,
        geo_feature_dim=meta["geo_feature_dim"],
        feature_dim=feature_dim,
        num_blocks=meta["neural_field_blocks"],
    )

    syn_in_dim = 2
    if meta.get("2d_semantic_input", False):
        syn_in_dim += meta["semantic_dim"]
    if meta.get("2d_label_input", False):
        syn_in_dim += 1
    params["synthesis_input"] = syn.init_synthesis_input(keys[1], syn_in_dim, feature_dim)

    style_in_dim = 1 if "segments" in meta["condition_modal_gen"] else 3
    params["synthesis_style_input"] = syn.init_synthesis_style_input(
        keys[2], style_in_dim, latent_dim, feature_dim, num_layers=3)

    net_in_dim = feature_dim + (latent_dim if meta.get("2d_latent_input", False) else 0)
    params["synthesis_network"], state["synthesis_network"], _ = syn.init_synthesis_network(
        keys[3],
        input_dim=net_in_dim,
        style_dim=feature_dim,
        hidden_dim=hidden_dim,
        num_blocks=meta["synthesis_blocks"],
        mod_blocks=meta["mod_blocks"],
        spatial_normalization=meta.get("spatial_normalization", "instance_norm"),
        map3d_mode=meta.get("map3d_mode", "isolated"),
    )

    params["neural_field_mapping_network"] = init_mapping_network(
        keys[4], latent_dim, hidden_dim, 2 * meta["neural_field_blocks"] * hidden_dim)

    params["synthesis_mapping_network"] = init_two_part_mapping_network(
        keys[5], z_dim=latent_dim, w_dim=feature_dim, implicit_dim=1, num_ws=1,
        trunk_layers=7, branch_layers=1, lr_multiplier=0.01)

    params["latent_pool"] = jnp.zeros((meta["dataset_length"], latent_dim), jnp.float32)

    return params, state


def _synthesis_meta(meta) -> Dict:
    return {
        "num_blocks": meta["synthesis_blocks"],
        "mod_blocks": tuple(meta["mod_blocks"]),
        "spatial_normalization": meta.get("spatial_normalization", "instance_norm"),
        "map3d_mode": meta.get("map3d_mode", "isolated"),
        # trainable fused half-block kernels (ops/synthesis_train.py);
        # tile_rows default None = auto-sized from the scoped-VMEM model
        "fused_train": meta.get("pallas_synthesis_train", False),
        "fused_tile_rows": meta.get("pallas_synthesis_train_tile_rows", None),
        "fused_interpret": meta.get("pallas_interpret", False),
    }


def render(
    params: Dict,
    freq: jax.Array,
    phase: jax.Array,
    conditions: Dict,
    rng: jax.Array,
    meta: Dict,
    compute_dtype=jnp.float32,
    nerf_noise=None,
    pallas_ok: bool = True,
):
    """Volume-render the pose-conditioned field (ref render :381-523).

    ``nerf_noise`` may be a traced scalar (it decays per training step,
    base_trainer.py:384); falls back to meta['nerf_noise'].

    Returns (rgb_render NHWC, feature_maps NHWC, depths (B,rays,1), weights,
    extrinsics).
    """
    render_w = meta["render_width"]
    render_h = meta["render_height"]
    num_steps = meta["num_steps"]
    field_apply = NEURAL_FIELD_REGISTRY[meta["neural_field_cls"]][1]

    skeletons = conditions["skeletons_xyz"]
    vertices = conditions["vertices"]
    tpose_vertices = conditions["tpose_vertices"]
    fk_matrices = conditions["fk_matrices"]
    lbs_weights = conditions["lbs_weights"]
    cam2world = conditions["cam2world_matrices"]
    focals = conditions["intrinsics"][:, 0, 0]
    scales = conditions["scales"].astype(jnp.float32)

    B = freq.shape[0]
    k_transform, k_noise = jax.random.split(rng)

    # --- camera rays (no_grad region in the reference; pure data here) ---
    points_cam, z_vals, rays_d_cam = vr.get_initial_rays_weak_perspective(
        focals, scales, num_steps, resolution=(render_w, render_h),
        ray_start=meta["ray_start"], ray_end=meta["ray_end"])

    (points, z_vals, ray_dirs, ray_origins, pitch, yaw, extrinsics) = vr.transform_sampled_points(
        points_cam, z_vals, rays_d_cam, k_transform,
        cam2world_matrix=cam2world, mode=meta.get("sample_dist"),
        h_stddev=meta.get("h_stddev", 1.0), v_stddev=meta.get("v_stddev", 1.0),
        h_mean=meta.get("h_mean", 0.0), v_mean=meta.get("v_mean", 0.0),
        perturb=meta.get("perturb_rays", True),
    )
    n_points = render_w * render_h * num_steps
    points = points.reshape(B, n_points, 3)
    ray_dirs_exp = vr.expand_ray_directions(ray_dirs, num_steps)
    if meta.get("lock_view_dependence", False):
        ray_dirs_exp = jnp.zeros_like(ray_dirs_exp).at[..., -1].set(-1.0)

    feature_dim = meta["feature_dim"]
    noise_std = meta.get("nerf_noise", 0.5) if nerf_noise is None else nerf_noise

    # pallas_ok=False marks a grad path (G step).  The kernel still serves
    # it through fused_field_render_trainable (Pallas forward + XLA-remat
    # backward custom VJP) unless pallas_field_train is disabled.
    grad_path = not pallas_ok
    use_pallas = (
        meta.get("pallas_field", False)
        and not meta.get("hierarchical_sample", False)
        and meta["clamp_mode"] == "relu"
        and (pallas_ok or meta.get("pallas_field_train", True))
    )
    # Geo fusion is OFF by default: measured 32.7 vs 34.9 imgs/sec/chip on
    # v5e — the in-kernel one-hot gather matmuls are too narrow for the MXU
    # once tile_rays drops to 32 to fit the (TILE_R, V) distance tiles in
    # VMEM.  Kept flag-gated for configs with small vertex counts.
    fuse_geo = (
        use_pallas
        and not grad_path
        and meta.get("pallas_fuse_geo", False)
        and not meta.get("disable_modulation", False)
    )

    # --- geo features (ref get_geo_features wrapper :196-205); skipped when
    # the fused kernel computes them in-VMEM (ops/raymarch._geo_slab) ---
    if fuse_geo:
        modulation = None
    elif meta.get("disable_modulation", False):
        modulation = jnp.zeros((B, n_points, meta["geo_feature_dim"]), points.dtype)
    else:
        modulation = jax.lax.stop_gradient(
            get_geo_features(points, skeletons, vertices, tpose_vertices,
                             fk_matrices, lbs_weights,
                             legacy_mode=meta.get("legacy_mode", False),
                             use_pallas_knn=meta.get("pallas_knn", False),
                             use_pallas_geo=meta.get("pallas_geo", False),
                             geo_tile_points=meta.get("pallas_geo_tile_points"),
                             interpret=meta.get("pallas_interpret", False)))

    if use_pallas:
        # fused Pallas ray-march: field + integration in VMEM per ray tile.
        # Inference and D-step fakes take the plain kernel; the G-step grad
        # path (pallas_ok=False) takes the custom-VJP wrapper (Pallas fwd +
        # XLA-remat bwd).  Training-time nerf_noise rides as an extra
        # packed column.
        from threedhumangan_tpu.ops.raymarch import (
            fused_field_render,
            fused_field_render_geo,
            fused_field_render_trainable,
            pack_field_inputs,
        )

        noise_col = None
        if not _is_zero(noise_std):
            noise_col = noise_std * jax.random.normal(k_noise, (B, n_points, 1))
        common = dict(
            num_steps=num_steps,
            # clamp: small configs (TINY/NANO) have fewer rays than a tile
            tile_rays=min(meta.get("pallas_tile_rays", 64),
                          render_w * render_h),
            white_back=meta.get("white_back", False),
            last_back=meta.get("last_back", False),
            compute_dtype=compute_dtype,
            exact_sin=not meta.get("fast_math", True),
            # fori_loop step axis: constant VMEM over steps, admits
            # tile_rays >= 128 (ops/raymarch._march docstring)
            march_loop=meta.get("pallas_march_loop", False),
            # stack N step slabs per SIREN eval: matmul M = N*tile_rays
            # fills the 128-row MXU at tile_rays=64 and amortizes MXU
            # weight loads (which equal compute passes at M=128)
            step_pack=meta.get("pallas_step_pack", 2),
            # fold freq/phase + omega into per-image weight tables and run
            # the step axis as a fori_loop over step_pack-sized groups —
            # the kernel is VPU-bound and folding deletes the per-element
            # FiLM mul/add (ops/raymarch._fused_field_render_folded)
            fold_film=meta.get("pallas_fold_film", True),
            # split each group into two interleaved half-chains so one
            # half's VPU sin overlaps the other's MXU matmul (folded
            # kernel only; needs M >= 256 — the planner raises step_pack).
            # Stock default ON since round 5: +1.0 imgs/s end-to-end at
            # 512L shapes (59.1-59.4 vs 58.2-58.3); pure scheduling, so
            # outputs match plain folded to 1e-6 (test_folded_pipe2_*) and
            # the planner guard turns it off when M = step_pack*T < 256
            # (tiny configs) rather than running underfilled half-chains
            pipe2=meta.get("pallas_fold_pipe2", True),
        )
        z_flat = z_vals.reshape(B, render_w * render_h, num_steps)
        if fuse_geo:
            # smaller ray tile: the in-kernel (TILE_R, V) distance/one-hot
            # tiles must fit VMEM next to the resident SIREN weights
            # (16 MB/core; 64 rays at width 420 overflows by ~0.5 MB)
            common["tile_rays"] = meta.get(
                "pallas_geo_tile_rays", min(common["tile_rays"], 32))
            common.pop("march_loop")  # geo-fused kernel is unroll-only
            common.pop("step_pack")   # and single-step-slab only
            common.pop("fold_film")   # folding lives in the plain kernel
            common.pop("pipe2")       # ditto the pipelined half-chains
            # per-vertex [blended inverse-FK (16); tpose (3)] table — the
            # only XLA-side geo prep; KNN + gather + canonicalization all
            # happen inside the kernel
            ik = jnp.linalg.inv(fk_matrices.astype(jnp.float32))
            vertex_ik = jnp.einsum(
                "bvj,bjkl->bvkl", lbs_weights.astype(jnp.float32), ik)
            V = vertices.shape[1]
            vfeat = jnp.concatenate(
                [vertex_ik.reshape(B, V, 16),
                 tpose_vertices.astype(jnp.float32)], axis=-1)
            cols = [points, ray_dirs_exp] + ([noise_col] if noise_col is not None else [])
            packed = jnp.concatenate(cols, axis=-1)
            render_out, depths = fused_field_render_geo(
                params["neural_field"], packed, freq, phase, z_flat,
                vertices.astype(jnp.float32), vfeat, skeletons,
                input_scaler=2.0 / meta["side_length"],
                legacy_mode=meta.get("legacy_mode", False),
                **common)
        else:
            packed = pack_field_inputs(
                points, modulation, ray_dirs_exp, 2.0 / meta["side_length"],
                noise=noise_col)
            if grad_path:
                # default ON: the full Pallas backward measures 305 vs 358
                # ms/batch8 (XLA-remat bwd) for the MAP3DBN G step on v5e
                render_out, depths = fused_field_render_trainable(
                    params["neural_field"], packed, freq, phase, z_flat,
                    pallas_bwd=meta.get("pallas_field_bwd", True),
                    **common)
            else:
                render_out, depths = fused_field_render(
                    params["neural_field"], packed, freq, phase, z_flat,
                    **common)
        weights = None
    else:
        # --- field evaluation (hot path, XLA formulation) ---
        def _field(field_params, f, p, pts, geo, dirs):
            return field_apply(
                field_params, pts, f, p, geo, dirs,
                input_scaler=2.0 / meta["side_length"], compute_dtype=compute_dtype,
                fast_math=meta.get("fast_math", True))

        # rematerialize the SIREN in the backward pass: its per-layer sin
        # activations are the largest training residuals.  Default ON (the
        # full D+G step OOMs without it at batch 8 even for the 65k-point
        # config once both step executables are resident); a standalone
        # G step is ~27% faster with remat_field/remat_synthesis disabled
        # when memory allows.  params/freq/phase are explicit arguments of
        # the checkpointed fn so their grads flow.
        if meta.get("remat_field", True):
            _field = jax.checkpoint(_field)

        def eval_field(pts, geo, dirs):
            return _field(params["neural_field"], freq, phase, pts, geo, dirs)

        coarse_out = eval_field(points, modulation, ray_dirs_exp)
        coarse_out = coarse_out.reshape(B, render_w * render_h, num_steps, feature_dim + 4)

        if meta.get("hierarchical_sample", False):
            # NeRF importance resampling (ref render :450-508; off in all
            # shipped configs but part of the surface).  fine_steps ==
            # coarse_steps, matching the reference call (ref :240-242).
            k_noise, k_hier, k_pdf = jax.random.split(k_noise, 3)
            n_rays = render_w * render_h
            _, _, c_weights = vr.ray_integration(
                jax.lax.stop_gradient(coarse_out), z_vals,
                noise_std=noise_std, rng=k_hier if not _is_zero(noise_std) else None,
                clamp_mode=meta["clamp_mode"])
            w_flat = c_weights.reshape(B * n_rays, num_steps) + 1e-5
            z_flat = z_vals.reshape(B * n_rays, num_steps)
            z_mid = 0.5 * (z_flat[:, :-1] + z_flat[:, 1:])
            fine_z = vr.sample_pdf(z_mid, w_flat[:, 1:-1], num_steps, rng=k_pdf)
            fine_z = jax.lax.stop_gradient(fine_z.reshape(B, n_rays, num_steps, 1))

            fine_points = (
                ray_origins[:, :, None, :]
                + ray_dirs[:, :, None, :] * fine_z
            ).reshape(B, n_rays * num_steps, 3)
            fine_geo = jax.lax.stop_gradient(
                jnp.zeros((B, fine_points.shape[1], meta["geo_feature_dim"]), points.dtype)
                if meta.get("disable_modulation", False) else
                get_geo_features(fine_points, skeletons, vertices, tpose_vertices,
                                 fk_matrices, lbs_weights,
                                 legacy_mode=meta.get("legacy_mode", False),
                                 use_pallas_knn=meta.get("pallas_knn", False)))
            fine_out = eval_field(fine_points, fine_geo, ray_dirs_exp)
            fine_out = fine_out.reshape(B, n_rays, num_steps, feature_dim + 4)

            # merge coarse + fine sorted by depth (ref :503-508)
            all_out = jnp.concatenate([fine_out, coarse_out], axis=-2)
            all_z = jnp.concatenate([fine_z, z_vals], axis=-2)
            order = jnp.argsort(all_z[..., 0], axis=-1)
            all_z = jnp.take_along_axis(all_z, order[..., None], axis=-2)
            all_out = jnp.take_along_axis(all_out, order[..., None], axis=-2)
            field_out, z_for_int = all_out, all_z
        else:
            field_out, z_for_int = coarse_out, z_vals

        render_out, depths, weights = vr.ray_integration(
            field_out, z_for_int,
            noise_std=noise_std, rng=k_noise if not _is_zero(noise_std) else None,
            white_back=meta.get("white_back", False),
            last_back=meta.get("last_back", False),
            clamp_mode=meta["clamp_mode"])

    render_out = render_out.reshape(B, render_h, render_w, feature_dim + 3)
    rgb_render = render_out[..., :3] * 2.0 - 1.0
    feature_maps = render_out[..., 3:]
    return rgb_render, feature_maps, depths, weights, extrinsics


def generate_avg_latent(params: Dict, rng: jax.Array, meta: Dict, n: int = 10000):
    """Mean (z, freq, phase, style) over n samples (ref :182-194)."""
    z = jax.random.normal(rng, (n, meta["latent_dim"]))
    freq, phase = apply_mapping_network(params["neural_field_mapping_network"], z)
    _, styles = apply_two_part_mapping_network(params["synthesis_mapping_network"], z)
    return (
        jnp.mean(z, axis=0, keepdims=True),
        jnp.mean(freq, axis=0, keepdims=True),
        jnp.mean(phase, axis=0, keepdims=True),
        jnp.mean(styles, axis=0, keepdims=True),
    )


def generator_forward(
    params: Dict,
    state: Dict,
    z: jax.Array,
    conditions: Dict,
    rng: jax.Array,
    meta: Dict,
    latent_indices: Optional[jax.Array] = None,
    train: bool = False,
    axis_name: Optional[str] = None,
    compute_dtype=jnp.float32,
    truncation_psi: float = 1.0,
    avg_latent=None,
    disable_synthesis: bool = False,
    with_depth: bool = False,
    nerf_noise=None,
    pallas_ok: bool = True,
):
    """Unified forward (ref forward :208-280 and staged_forward :282-378 —
    the two differ only by truncation/depth, both supported here).

    Returns (output dict, new_state).  Images NHWC in [-1, 1].
    """
    B = z.shape[0]
    gen_h, gen_w = meta["gen_height"], meta["gen_width"]
    render_h, render_w = meta["render_height"], meta["render_width"]
    latent = z

    if latent_indices is not None:
        latent = params["latent_pool"][latent_indices]

    if meta.get("neural_field_latent_input", True):
        freq, phase = apply_mapping_network(
            params["neural_field_mapping_network"], latent, compute_dtype)
    else:
        freq, phase = apply_mapping_network(
            params["neural_field_mapping_network"], jnp.zeros_like(latent), compute_dtype)

    _, synthesis_styles = apply_two_part_mapping_network(
        params["synthesis_mapping_network"], latent, compute_dtype)

    if truncation_psi < 1.0:
        if avg_latent is None:
            k_avg, rng = jax.random.split(rng)
            avg_latent = generate_avg_latent(params, k_avg, meta)
        avg_z, avg_freq, avg_phase, avg_styles = avg_latent
        freq = avg_freq + truncation_psi * (freq - avg_freq)
        phase = avg_phase + truncation_psi * (phase - avg_phase)
        latent = avg_z + truncation_psi * (latent - avg_z)
        synthesis_styles = avg_styles + truncation_psi * (synthesis_styles - avg_styles)

    depths = None
    if meta.get("disable_render", False):
        condition_modal = meta["condition_modal_gen"]
        condition = conditions[condition_modal]
        if "segments" in condition_modal:
            condition = condition[..., None].astype(latent.dtype) / (meta["label_dim"] - 1) * 2 - 1
        if meta.get("spade_latent_input", True):
            feature_maps = syn.apply_synthesis_style_input(
                params["synthesis_style_input"], condition, latent, compute_dtype)
        else:
            feature_maps = syn.apply_synthesis_style_input(
                params["synthesis_style_input"], condition, jnp.zeros_like(latent), compute_dtype)
        rgb_render = jnp.zeros((B, render_h, render_w, 3), latent.dtype)
        depths = jnp.zeros((B, render_h * render_w, 1), latent.dtype)
    else:
        rgb_render, feature_maps, depths, weights, extrinsics = render(
            params, freq, phase, conditions, rng, meta, compute_dtype,
            nerf_noise=nerf_noise, pallas_ok=pallas_ok)

    interp = meta.get("feature_map_interpolation", "bilinear")
    # upsample in compute dtype: the (B, gen_h, gen_w, F) style map is the
    # largest tensor in the model and the resize is pure bandwidth
    feature_maps = jax.image.resize(
        feature_maps.astype(compute_dtype),
        (B, gen_h, gen_w, feature_maps.shape[-1]), method=interp)

    new_state = state
    use_fused_synthesis = (
        meta.get("pallas_synthesis", False)
        and not train
        and not meta.get("2d_label_input", False)
        and not meta.get("2d_latent_input", False)
        and meta.get("spatial_normalization") in ("batch_norm", "adaptive_batch_norm")
    )
    if disable_synthesis or meta.get("disable_synthesis", False):
        output = {"rgbs": rgb_render, "rgbs_render": rgb_render}
    elif use_fused_synthesis:
        # whole-network Pallas kernel (ops/synthesis_kernel.py): one style
        # read + one rgb write instead of ~50 GB of per-block HBM traffic
        from threedhumangan_tpu.ops.synthesis_kernel import (
            fold_synthesis_params,
            fused_synthesis,
        )

        folded = fold_synthesis_params(
            params["synthesis_network"], state["synthesis_network"],
            params["synthesis_input"], meta["spatial_normalization"])
        rgbs = fused_synthesis(
            folded, feature_maps, synthesis_styles,
            num_blocks=meta["synthesis_blocks"],
            mod_blocks=tuple(meta["mod_blocks"]),
            map3d_mode=meta.get("map3d_mode", "isolated"),
            tile_rows=meta.get("pallas_synthesis_tile_rows", 2),
            compute_dtype=compute_dtype,
            # None -> largest VMEM-fitting stage (auto_synth_stages); at
            # 512x256x420 that is all 9 blocks in ONE stage (no bf16 HBM
            # round-trip of the carry between stages)
            blocks_per_stage=meta.get("pallas_synthesis_blocks_per_stage"),
        )
        output = {"rgbs": rgbs, "rgbs_render": rgb_render}
    else:
        coords = syn.get_2d_coords(B, gen_h, gen_w, dtype=jnp.float32)
        if meta.get("2d_label_input", False):
            label = conditions["rasterized_segments"][..., None] / meta["label_dim"] * 2 - 1
            coords = jnp.concatenate([coords, label.astype(coords.dtype)], axis=-1)
        synthesis_input = syn.apply_synthesis_input(
            params["synthesis_input"], coords, compute_dtype)
        if meta.get("2d_latent_input", False):
            lat = jnp.broadcast_to(
                latent[:, None, None, :], (B, gen_h, gen_w, latent.shape[-1]))
            synthesis_input = jnp.concatenate([synthesis_input, lat.astype(synthesis_input.dtype)], axis=-1)

        syn_out, syn_state = syn.apply_synthesis_network(
            params["synthesis_network"], state["synthesis_network"], _synthesis_meta(meta),
            synthesis_input, feature_maps, synthesis_styles,
            train=train, axis_name=axis_name, compute_dtype=compute_dtype,
            remat=train and meta.get("remat_synthesis", True))
        new_state = dict(state)
        new_state["synthesis_network"] = syn_state
        output = {"rgbs": syn_out["final"], "rgbs_render": rgb_render}

    if with_depth and depths is not None:
        # normalized depth map (ref staged_forward :364-376)
        focals = conditions["intrinsics"][:, 0, 0]
        scales = conditions["scales"].astype(jnp.float32)
        z_centers = focals / scales
        depth = depths - z_centers.reshape(B, 1, 1)
        depth = depth / (meta["depth_length"] / 2.0)
        depth = jnp.clip(depth, -1.0, 1.0)
        output["depths"] = depth.reshape(B, render_h, render_w, 1)
        output["skeletons"] = conditions["skeletons_xyz"]

    return output, new_state


def staged_forward(
    params, state, z, conditions, rng, meta,
    truncation_psi: Optional[float] = None, avg_latent=None, compute_dtype=jnp.float32,
):
    """Inference entry (ref staged_forward :282-378).  No chunking needed on
    TPU — see module docstring."""
    psi = meta.get("truncation_psi", 1.0) if truncation_psi is None else truncation_psi
    return generator_forward(
        params, state, z, conditions, rng, meta,
        train=False, compute_dtype=compute_dtype,
        truncation_psi=psi, avg_latent=avg_latent, with_depth=True,
    )
