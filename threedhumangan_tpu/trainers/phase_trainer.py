"""PhaseTrainer: the adversarial training loop as pure jitted step functions.

Behavioural parity with reference ``lib/trainers/phase_trainer.py`` and
``base_trainer.py``:
  * 8-slot phase schedule cycled by step (rotate / do_r1 flags,
    configs/map3d.py:10-19; phase lookup phase_trainer.py:299-300);
  * D step (ref :297-318, :344-443): preprocess (rasterize) -> G forward
    (no grad) -> D(real) with R1 on the segmentation softmax (x4 on R1
    phases, ref :392) -> D(fake) -> balanced segmentation CE (+ optional
    softplus GAN / latent regression);
  * G step (ref :321-341, :446-550): G -> D -> segmentation CE against a
    randomly chosen GT modal (rasterized vs annotated, ref :533), optional
    gan/latent/photometric losses; grad-clip 1.0, EMA update;
  * nerf_noise decay max(0, 1 - step/5000) (base_trainer.py:384) enters the
    step as a traced scalar;
  * per-group Adam lrs (ref :57-84) via trainers.optim.

TPU-first: each step is ONE jit-compiled function — preprocessing
(rasterization), generator, discriminator, losses, R1 double-grad, optimizer
and EMA all fuse into a single XLA program; under a mesh the same function
runs under shard_map with psum'd grads (= DDP) and pmean'd BN moments
(= SyncBatchNorm).  No GradScaler: bf16 activations + f32 params/grads.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from threedhumangan_tpu.models.discriminator import discriminator_forward, init_discriminator
from threedhumangan_tpu.models.generator import generator_forward, init_generator
from threedhumangan_tpu.trainers import losses as L
from threedhumangan_tpu.trainers.optim import adam_step, generator_lr_multipliers, make_adam
from threedhumangan_tpu.utils.ema import ema_init, ema_update
from threedhumangan_tpu.utils.misc import normalize_2nd_moment, policy_from_meta
from threedhumangan_tpu.parallel.stats import moments, psum_moments


class TrainState(NamedTuple):
    params_G: Dict
    state_G: Dict
    params_D: Dict
    state_D: Dict
    opt_G: tuple
    opt_D: tuple
    ema: Dict
    step: jax.Array


def init_train_state(key, meta: Dict) -> TrainState:
    kg, kd = jax.random.split(key)
    params_G, state_G = init_generator(kg, meta)
    params_D, state_D = init_discriminator(kd, meta)
    opt = make_adam(tuple(meta["betas"]))
    return TrainState(
        params_G=params_G,
        state_G=state_G,
        params_D=params_D,
        state_D=state_D,
        opt_G=opt.init(params_G),
        opt_D=opt.init(params_D),
        ema=ema_init(params_G),
        step=jnp.zeros((), jnp.int32),
    )


def _disc_input_real(real_images, phase, meta):
    """(ref _get_disc_input_real :162-188).  The reference's alpha-dependent
    dual-discrimination rescale uses a runtime-varying resolution; under jit
    we pin alpha=1 semantics (fade_steps=1 in every shipped config, so alpha
    reaches 1 after the first step)."""
    B = real_images.shape[0]
    rh, rw = meta["render_height"], meta["render_width"]
    gh, gw = meta["gen_height"], meta["gen_width"]
    if meta.get("dual_discrimination", False):
        down = jax.image.resize(real_images, (B, rh, rw, 3), "bilinear")
        render_like = jax.image.resize(down, (B, gh, gw, 3), "bilinear")
        return jnp.concatenate([render_like, real_images], axis=-1)
    if "render" in phase["gen_modal"]:
        return jax.image.resize(real_images, (B, rh, rw, 3), "bilinear")
    return real_images


def _disc_input_gen(gen_out, phase, meta):
    """(ref _get_disc_input_gen :191-200)"""
    if meta.get("dual_discrimination", False):
        rgbs = gen_out["rgbs"]
        B, gh, gw, _ = rgbs.shape
        render_up = jax.image.resize(gen_out["rgbs_render"], (B, gh, gw, 3), "bilinear")
        return jnp.concatenate([render_up, rgbs], axis=-1)
    return gen_out[phase["gen_modal"]]


_VGG_CACHE: Dict[str, list] = {}


def _vgg_convs():
    """Lazily-built VGG16 feature params (ref phase_trainer.py:51-54 builds
    the perceptual net once, only when perceptual_lambda > 0)."""
    if "convs" not in _VGG_CACHE:
        from threedhumangan_tpu.trainers.perceptual import init_vgg16_features

        _VGG_CACHE["convs"] = init_vgg16_features()
    return _VGG_CACHE["convs"]


def _group_norm_stats(tree: Dict, prefix: str) -> Dict:
    """Per-top-level-group global-norm scalars (the TPU stand-in for the
    reference's per-module weight/grad histograms, ref base_trainer.py
    log_weights :211-223) — emitted as psum-able moment vectors."""
    out = {}
    for k, sub in tree.items():
        leaves = jax.tree.leaves(sub)
        if not leaves:
            continue
        norm = jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                            for x in leaves))
        out[f"{prefix}/{k}"] = moments(norm)
    return out


def _choose_segments(rng, rotate, rasterized, body, p: float = 0.5):
    """ref :352-354 — rotated phases must use rasterized labels (annotations
    no longer align); otherwise a 50/50 coin.  ``rotate`` may be traced:
    phase flags enter the step as data so one program serves every phase
    slot (4x fewer XLA compiles per curriculum stage)."""
    coin = jax.random.uniform(rng, ()) < p
    use_raster = jnp.asarray(rotate, bool) | coin
    return jnp.where(use_raster, rasterized, body)


# ---------------------------------------------------------------------------
# discriminator step
# ---------------------------------------------------------------------------


def _maybe_augment(images, rng, meta, ada_p):
    """Apply ADA at probability ada_p to a D input batch.  The reference
    wires the controller but never applies the pipe (SURVEY.md §5 caveat);
    here application is correct (both real and fake inputs) and statically
    disabled when ada_interval == 0, preserving shipped-config parity."""
    if not meta.get("ada_interval", 0):
        return images
    from threedhumangan_tpu.data.augment import augment_pipe

    return augment_pipe(images, rng, meta.get("ada_aug", {}), ada_p)


def d_train_step(
    ts: TrainState,
    data: Dict,
    rng: jax.Array,
    lr: jax.Array,
    nerf_noise: jax.Array,
    preprocessor,
    meta: Dict,
    phase: Dict,
    axis_name: Optional[str] = None,
    ada_p: jax.Array = 0.0,
) -> Tuple[TrainState, Dict]:
    """(ref train_discriminator :297-318 + _train_discriminator :344-443)"""
    policy = policy_from_meta(meta)
    cdt = policy.compute_dtype
    gan_lambda = meta["gan_lambda"]
    seg_lambda = meta["segmentation_lambda"]
    latent_lambda = meta.get("latent_lambda", 0)
    label_dim = meta["label_dim"]

    k_pre, k_z, k_g, k_seg, k_d, k_aug1, k_aug2 = jax.random.split(rng, 7)
    data = preprocessor(data, phase["rotate"], k_pre)

    real_images = _maybe_augment(data["images"], k_aug1, meta, ada_p)
    real_images = _disc_input_real(real_images, phase, meta)
    B = real_images.shape[0]
    real_segments = _choose_segments(
        k_seg, phase["rotate"], data["rasterized_segments"],
        data["body_segments"].astype(jnp.int32))

    # generate fakes (no grad to G), batch_split micro-batched via lax.scan
    # (ref :358-382: per-split no_grad G forwards, outputs concatenated;
    # scan keeps peak memory at one split's working set and compile size
    # constant in n_split)
    z = jax.random.normal(k_z, (B, meta["latent_dim"]))
    n_split = int(meta.get("batch_split", 1))
    gen_kwargs = dict(
        train=True, axis_name=axis_name, compute_dtype=cdt, nerf_noise=nerf_noise,
        disable_synthesis=(phase["gen_modal"] != "rgbs"))

    def _gen(sG, z_c, data_c, key):
        return generator_forward(
            ts.params_G, sG, z_c, data_c, key, meta,
            latent_indices=None if phase["uncond"] else data_c["indices"],
            **gen_kwargs)

    if n_split <= 1:
        gen_out, state_G = _gen(ts.state_G, z, data, k_g)
    else:
        chunk = lambda x: x.reshape((n_split, B // n_split) + x.shape[1:])

        def body(sG, xs):
            data_c, z_c, i = xs
            out, sG = _gen(sG, z_c, data_c, jax.random.fold_in(k_g, i))
            return sG, out

        state_G, outs = jax.lax.scan(
            body, ts.state_G,
            (jax.tree.map(chunk, data), chunk(z), jnp.arange(n_split)))
        gen_out = jax.tree.map(lambda x: x.reshape((B,) + x.shape[2:]), outs)
    fake_images = jax.lax.stop_gradient(_disc_input_gen(gen_out, phase, meta))
    fake_images = _maybe_augment(fake_images, k_aug2, meta, ada_p)
    state_G = jax.lax.stop_gradient(state_G)

    def loss_fn(params_D):
        out_real, sD = discriminator_forward(
            params_D, ts.state_D, real_images, data, train=True, compute_dtype=cdt)
        out_fake, sD = discriminator_forward(
            params_D, sD, fake_images, data, train=True, compute_dtype=cdt)
        pred_real, pred_fake = out_real["prediction"], out_fake["prediction"]

        stats = {}
        if gan_lambda > 0:
            gan = gan_lambda * L.gan_loss_d(pred_real, pred_fake)
            stats["real_signs"] = moments(jnp.sign(pred_real))
        else:
            gan = 0.0 * (jnp.sum(pred_real) + jnp.sum(pred_fake))

        if seg_lambda > 0:
            seg_real, acc_real, prob_real = L.segmentation_loss(
                out_real["segments"], real_segments, label_dim,
                meta.get("segmentation_loss_mode", "cross_entropy_balanced"),
                meta.get("segmentation_weights"))
            seg_fake, _, prob_fake = L.segmentation_loss(
                out_fake["segments"], jnp.zeros_like(real_segments), label_dim,
                meta.get("segmentation_loss_mode", "cross_entropy_balanced"),
                meta.get("segmentation_weights"))
            seg = (seg_real + seg_fake) * seg_lambda
            stats["d_segmentation_loss"] = moments(seg)
            stats["segmentation_acc_real"] = moments(acc_real)
            stats["segmentation_prob_real"] = moments(prob_real)
            stats["segmentation_prob_gen"] = moments(prob_fake)
        else:
            seg = 0.0 * (jnp.sum(out_real["segments"]) + jnp.sum(out_fake["segments"]))

        if latent_lambda > 0:
            gt_real = normalize_2nd_moment(data["latents"])
            gt_gen = normalize_2nd_moment(z)
            lat = latent_lambda * (
                L.smooth_l1(normalize_2nd_moment(out_fake["latents"]), gt_gen)
                + L.smooth_l1(normalize_2nd_moment(out_real["latents"]), gt_real))
            stats["d_latent_loss"] = moments(lat)
        else:
            lat = 0.0 * (jnp.sum(out_real["latents"]) + jnp.sum(out_fake["latents"]))

        # R1 on the real input (x4 on R1 phases, ref :392).  do_r1 is a
        # TRACED flag under lax.cond: both branches compile once into the
        # single per-stage program (the R1 double-backward subgraph is the
        # only duplicated piece) instead of two whole-step variants.
        if meta["r1_lambda"] > 0:
            d_fn = lambda img: discriminator_forward(
                params_D, ts.state_D, img, data, train=False, compute_dtype=cdt)[0]
            r1 = jax.lax.cond(
                jnp.asarray(phase["do_r1"], bool),
                lambda imgs: 4.0 * L.r1_regularization(
                    d_fn, imgs, meta["r1_lambda"], gan_lambda, seg_lambda),
                lambda imgs: jnp.float32(0.0),
                real_images)
            # zero-COUNT moment on non-R1 phases so Collector.mean averages
            # over R1 steps only (ref phase_trainer.py:392-393 reports r1
            # only on do_r1 steps; a count=1 zero would dilute the mean ~4x)
            stats["r1"] = jnp.where(
                jnp.asarray(phase["do_r1"], bool),
                moments(r1 / 4.0), jnp.zeros(3, jnp.float32))
        else:
            r1 = 0.0

        loss = gan + seg + lat + r1
        stats["d_loss"] = moments(loss)
        return loss, (sD, stats)

    (d_loss, (state_D, stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params_D)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
    stats.update(_group_norm_stats(grads, "d_grad_norm"))
    stats.update(_group_norm_stats(ts.params_D, "d_weight_norm"))

    opt = make_adam(tuple(meta["betas"]))
    params_D, opt_D = adam_step(
        opt, ts.opt_D, grads, ts.params_D, lr, grad_clip=meta.get("grad_clip", 0.0))

    stats = psum_moments(stats, axis_name)
    return ts._replace(params_D=params_D, opt_D=opt_D, state_D=state_D, state_G=state_G), stats


# ---------------------------------------------------------------------------
# generator step
# ---------------------------------------------------------------------------


def g_train_step(
    ts: TrainState,
    data: Dict,
    rng: jax.Array,
    lr: jax.Array,
    nerf_noise: jax.Array,
    preprocessor,
    meta: Dict,
    phase: Dict,
    axis_name: Optional[str] = None,
    ada_p: jax.Array = 0.0,
) -> Tuple[TrainState, Dict]:
    """(ref train_generator :321-341 + _train_generator :446-550)"""
    policy = policy_from_meta(meta)
    cdt = policy.compute_dtype
    gan_lambda = meta["gan_lambda"] if phase["uncond"] else 0
    seg_lambda = meta["segmentation_lambda"]
    latent_lambda = meta.get("latent_lambda", 0)
    label_dim = meta["label_dim"]

    k_pre, k_z, k_g, k_seg, k_d, k_aug = jax.random.split(rng, 6)
    data = preprocessor(data, phase["rotate"], k_pre)
    B = data["images"].shape[0]
    z = jax.random.normal(k_z, (B, meta["latent_dim"]))

    gt_segments = _choose_segments(
        k_seg, phase["rotate"], data["rasterized_segments"],
        data["body_segments"].astype(jnp.int32))

    def loss_fn(params_G, data, z, gt_segments, sG_in, sD_in, k_g):
        gen_out, sG = generator_forward(
            params_G, sG_in, z, data, k_g, meta,
            latent_indices=None if phase["uncond"] else data["indices"],
            train=True, axis_name=axis_name, compute_dtype=cdt, nerf_noise=nerf_noise,
            disable_synthesis=(phase["gen_modal"] != "rgbs"),
            pallas_ok=False)  # grads flow through the field: XLA path
        fake_images = _disc_input_gen(gen_out, phase, meta)
        fake_aug = _maybe_augment(fake_images, k_aug, meta, ada_p)

        out, sD = discriminator_forward(
            ts.params_D, sD_in, fake_aug, data, train=True, compute_dtype=cdt)
        pred_gen = out["prediction"]

        stats = {}
        if gan_lambda > 0:
            # top-k prediction filtering decays the kept fraction with step
            # (ref :482-494; no-op unless topk_interval/topk_v configured)
            gan = gan_lambda * L.gan_loss_g_topk(pred_gen, ts.step, meta)
            stats["gen_signs"] = moments(jnp.sign(pred_gen))
        else:
            gan = 0.0 * jnp.sum(pred_gen)

        if seg_lambda > 0:
            seg, _, _ = L.segmentation_loss(
                out["segments"], gt_segments, label_dim,
                meta.get("segmentation_loss_mode", "cross_entropy_balanced"),
                meta.get("segmentation_weights"))
            seg = seg * seg_lambda
            stats["g_segmentation_loss"] = moments(seg)
        else:
            seg = 0.0 * jnp.sum(out["segments"])

        if latent_lambda > 0:
            if phase["uncond"]:
                gt_lat = normalize_2nd_moment(z)
            else:
                gt_lat = jax.lax.stop_gradient(
                    normalize_2nd_moment(params_G["latent_pool"][data["indices"]]))
            lat = L.smooth_l1(normalize_2nd_moment(out["latents"]), gt_lat)
            if not phase["uncond"]:
                # ref :506-507: an extra z-vs-inversion-latent term (constant
                # w.r.t. params — kept for loss-value parity)
                lat = lat + L.smooth_l1(z, jax.lax.stop_gradient(data["latents"]))
            lat = latent_lambda * lat
            stats["g_latent_loss"] = moments(lat)
        else:
            lat = 0.0 * jnp.sum(out["latents"]) if "latents" in out else 0.0

        if not phase["uncond"] and sum(meta.get("perceptual_lambda", [0])) > 0:
            # VGG16 feature distances on [0,1] images (ref :515-523)
            from threedhumangan_tpu.trainers.perceptual import perceptual_loss

            convs = _vgg_convs()
            pls = perceptual_loss(
                convs, 0.5 * gen_out[phase["gen_modal"]] + 0.5,
                0.5 * data["images"] + 0.5)
            perc = sum(lam * pl for lam, pl in zip(meta["perceptual_lambda"], pls))
            stats["perceptual_loss"] = moments(perc)
        else:
            perc = 0.0

        if not phase["uncond"] and meta.get("photometric_lambda", 0) > 0:
            # photometric loss compares the raw generated modal, not the
            # (possibly 6-channel dual) discriminator input (ref :525-529)
            photo = meta["photometric_lambda"] * L.smooth_l1(
                gen_out[phase["gen_modal"]], data["images"])
            stats["photometric_loss"] = moments(photo)
        else:
            photo = 0.0

        loss = gan + seg + lat + perc + photo
        stats["g_loss"] = moments(loss)
        return loss, (sG, sD, stats)

    # batch_split micro-batching (ref :456-548: per-split forward+backward
    # with grads accumulated; losses are divided by the split count so the
    # accumulated gradient equals the full-batch gradient).  lax.scan keeps
    # compile size and peak memory constant in n_split.
    n_split = int(meta.get("batch_split", 1))
    vag = jax.value_and_grad(loss_fn, has_aux=True)
    if n_split <= 1:
        (g_loss, (state_G, state_D, stats)), grads = vag(
            ts.params_G, data, z, gt_segments, ts.state_G, ts.state_D, k_g)
    else:
        B_split = data["images"].shape[0] // n_split
        chunk = lambda x: x.reshape((n_split, B_split) + x.shape[1:])

        def body(carry, xs):
            grads, sG, sD = carry
            data_c, z_c, gt_c, i = xs
            (l, (sG, sD, stats)), g = vag(
                ts.params_G, data_c, z_c, gt_c, sG, sD,
                jax.random.fold_in(k_g, i))
            grads = jax.tree.map(lambda a, b: a + b / n_split, grads, g)
            return (grads, sG, sD), (l / n_split, stats)

        zero_grads = jax.tree.map(jnp.zeros_like, ts.params_G)
        (grads, state_G, state_D), (losses, stats_stack) = jax.lax.scan(
            body, (zero_grads, ts.state_G, ts.state_D),
            (jax.tree.map(chunk, data), chunk(z), chunk(gt_segments),
             jnp.arange(n_split)))
        g_loss = jnp.sum(losses)
        # stats are (count, sum, sumsq) moment triples: summing over the
        # split axis is the exact aggregation
        stats = jax.tree.map(lambda s: jnp.sum(s, axis=0), stats_stack)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
    stats.update(_group_norm_stats(grads, "g_grad_norm"))
    stats.update(_group_norm_stats(ts.params_G, "g_weight_norm"))

    opt = make_adam(tuple(meta["betas"]))
    params_G, opt_G = adam_step(
        opt, ts.opt_G, grads, ts.params_G, lr,
        lr_multipliers=generator_lr_multipliers(ts.params_G, meta),
        grad_clip=meta.get("grad_clip", 0.0))

    ema = ema_update(ts.ema, params_G)
    stats = psum_moments(stats, axis_name)
    new_ts = ts._replace(
        params_G=params_G, opt_G=opt_G, state_G=state_G, state_D=state_D,
        ema=ema, step=ts.step + 1)
    return new_ts, stats


# ---------------------------------------------------------------------------
# jit wrappers (phase flags are static -> at most 4 compiled variants)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("preprocessor", "meta_hash", "uncond", "gen_modal"),
)
def _d_step_jit(ts, data, rng, lr, nerf_noise, ada_p, rotate, do_r1,
                preprocessor, meta_hash, uncond, gen_modal):
    meta = _META_CACHE[meta_hash]
    phase = {"rotate": rotate, "do_r1": do_r1, "uncond": uncond, "gen_modal": gen_modal}
    return d_train_step(ts, data, rng, lr, nerf_noise, preprocessor, meta, phase,
                        ada_p=ada_p)


@functools.partial(
    jax.jit,
    static_argnames=("preprocessor", "meta_hash", "uncond", "gen_modal"),
)
def _g_step_jit(ts, data, rng, lr, nerf_noise, ada_p, rotate, do_r1,
                preprocessor, meta_hash, uncond, gen_modal):
    meta = _META_CACHE[meta_hash]
    phase = {"rotate": rotate, "do_r1": do_r1, "uncond": uncond, "gen_modal": gen_modal}
    return g_train_step(ts, data, rng, lr, nerf_noise, preprocessor, meta, phase,
                        ada_p=ada_p)


_META_CACHE: Dict[int, Dict] = {}


# keys with no effect on the compiled computation (presentation /
# schedule-host-side only) — excluded from the content hash so e.g. two
# configs differing only by "name" share every compiled step
_NONCOMPUTE_META_KEYS = ("nerf_noise", "name", "output_dir")


def register_meta(meta: Dict) -> int:
    """Static-side registry so the config dict can cross the jit boundary as
    a hashable key.  Keyed by CONTENT (not id) so re-extracting metadata each
    step (ref base_trainer.py:368) never retriggers compilation."""
    key = hash(repr(sorted((k, repr(v)) for k, v in meta.items()
                           if k not in _NONCOMPUTE_META_KEYS)))
    if key not in _META_CACHE:
        _META_CACHE[key] = meta
    return key


_MESH_PAIR_CACHE: Dict[tuple, callable] = {}


def make_mesh_train_pair(mesh, preprocessor, meta: Dict, axis_name: str = "data"):
    """SPMD training-step factory — the TPU-native equivalent of the
    reference's DDP wrap (ref base_trainer.py:102-104, apps/train.py:57).

    Memoized on (mesh, preprocessor content, meta content): rebuilding a
    Trainer (resume, tests) or revisiting a curriculum stage reuses the
    already-traced step instead of re-tracing ~identical programs.

    Returns ``step(ts, batch, rng, phase, lr_g, lr_d, nerf_noise, ada_p)``
    running D then G in ONE jitted shard_map program: the global batch is
    sharded over the mesh's data axis, params/opt state replicated, grads
    pmean'd and BN moments pmean'd over ICI, stats psum'd; per-replica RNG
    via fold_in(axis_index) (= reference per-rank seeding,
    apps/train.py:70-72).  TrainState buffers are donated so parameters
    update in place (no 2x HBM residency).

    At most 4 phase-flag variants compile per stage (``meta`` is closed
    over; the Trainer rebuilds this factory on curriculum stage changes).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    memo_key = (mesh, preprocessor, register_meta(meta), axis_name)
    if memo_key in _MESH_PAIR_CACHE:
        return _MESH_PAIR_CACHE[memo_key]

    cache: Dict[tuple, callable] = {}

    def _build(phase_key):
        uncond, gen_modal = phase_key

        def full(ts, data, rng, rotate, do_r1, lr_d, lr_g, noise, ada):
            phase = {"rotate": rotate, "do_r1": do_r1, "uncond": uncond,
                     "gen_modal": gen_modal}
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
            k_d, k_g = jax.random.split(rng)
            ts, d_stats = d_train_step(
                ts, data, k_d, lr_d, noise, preprocessor, meta, phase,
                axis_name=axis_name, ada_p=ada)
            ts, g_stats = g_train_step(
                ts, data, k_g, lr_g, noise, preprocessor, meta, phase,
                axis_name=axis_name, ada_p=ada)
            return ts, {**d_stats, **g_stats}

        sharded = shard_map(
            full, mesh=mesh,
            in_specs=(P(), P(axis_name), P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(), P()),
            check_rep=False)
        return jax.jit(sharded, donate_argnums=(0,))

    def step(ts, batch, rng, phase, lr_g, lr_d, nerf_noise, ada_p=0.0):
        # rotate/do_r1 enter as DATA: one compiled program serves all 8
        # phase slots of the shipped configs (uncond/gen_modal are uniform
        # there); 4x fewer ~minutes-long XLA compiles per stage
        key = (phase["uncond"], phase["gen_modal"])
        if key not in cache:
            cache[key] = _build(key)
        return cache[key](
            ts, batch, rng,
            jnp.asarray(phase["rotate"], bool), jnp.asarray(phase["do_r1"], bool),
            jnp.asarray(lr_d, jnp.float32), jnp.asarray(lr_g, jnp.float32),
            jnp.asarray(nerf_noise, jnp.float32), jnp.asarray(ada_p, jnp.float32))

    def aot_compile(ts, batch, rng, phase, lr_g, lr_d, nerf_noise, ada_p=0.0):
        """Compile the step WITHOUT executing it (no collectives run).

        Multi-process CPU runs need this: XLA's Gloo rendezvous has a hard
        ~30s key-exchange timeout, and the first step's multi-minute compile
        is unsynchronized across processes — so each process AOT-compiles
        (populating the persistent compile cache the later real call hits),
        then the processes barrier on the coordination service (long
        timeout), and only then execute (skew ~ms).
        """
        key = (phase["uncond"], phase["gen_modal"])
        if key not in cache:
            cache[key] = _build(key)
        cache[key].lower(
            ts, batch, rng,
            jnp.asarray(phase["rotate"], bool), jnp.asarray(phase["do_r1"], bool),
            jnp.asarray(lr_d, jnp.float32), jnp.asarray(lr_g, jnp.float32),
            jnp.asarray(nerf_noise, jnp.float32),
            jnp.asarray(ada_p, jnp.float32)).compile()

    step.aot_compile = aot_compile
    _MESH_PAIR_CACHE[memo_key] = step
    return step


def train_step_pair(ts, data, rng, meta, preprocessor, phase, lr_g, lr_d,
                    nerf_noise, ada_p: float = 0.0):
    """One full training iteration: D step then G step (ref run :386-397)."""
    meta_hash = register_meta(meta)
    k_d, k_g = jax.random.split(rng)
    ada = jnp.asarray(ada_p, jnp.float32)
    rot = jnp.asarray(phase["rotate"], bool)
    dr1 = jnp.asarray(phase["do_r1"], bool)
    ts, d_stats = _d_step_jit(
        ts, data, k_d, jnp.asarray(lr_d, jnp.float32), jnp.asarray(nerf_noise, jnp.float32),
        ada, rot, dr1, preprocessor, meta_hash,
        phase["uncond"], phase["gen_modal"])
    ts, g_stats = _g_step_jit(
        ts, data, k_g, jnp.asarray(lr_g, jnp.float32), jnp.asarray(nerf_noise, jnp.float32),
        ada, rot, dr1, preprocessor, meta_hash,
        phase["uncond"], phase["gen_modal"])
    return ts, {**d_stats, **g_stats}
