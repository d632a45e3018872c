"""End-to-end tests: synthetic dataset -> preprocessor -> generator ->
discriminator -> train steps.  Exercises the full MAP3DBN_NANO pipeline
(SURVEY.md §7 'minimum end-to-end slice' + trainer) — NANO rather than
TINY because each train_step variant here costs a full D+G XLA compile
and the assertions are shape-agnostic; TINY-scale compilation is covered
by the verify CLI recipe."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threedhumangan_tpu import configs
from threedhumangan_tpu.data.dataset import SyntheticSHHQDataset, iterate_batches
from threedhumangan_tpu.data.preprocessor import get_preprocessor
from threedhumangan_tpu.models.generator import (
    generator_forward,
    init_generator,
    staged_forward,
)
from threedhumangan_tpu.models.smpl import synthetic_smpl_model
from threedhumangan_tpu.trainers.phase_trainer import (
    init_train_state,
    train_step_pair,
)


@pytest.fixture(scope="module")
def tiny():
    meta = configs.extract_metadata(configs.MAP3DBN_NANO, 0)
    smpl = synthetic_smpl_model(num_verts=96, num_faces=64)
    ds = SyntheticSHHQDataset(smpl_model=smpl, **meta)
    pre = get_preprocessor(meta, smpl_model=smpl)
    batch = next(iterate_batches(ds, 2, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return meta, smpl, ds, pre, batch


def test_preprocessor_outputs(tiny):
    meta, smpl, ds, pre, batch = tiny
    rng = jax.random.PRNGKey(0)
    out = pre(batch, rotate=False, rng=rng)
    H, W = meta["gen_height"], meta["gen_width"]
    assert out["rasterized_segments"].shape == (2, H, W)
    assert out["rasterized_semantics"].shape == (2, H, W, 3)
    assert out["cam2world_matrices"].shape == (2, 4, 4)
    segs = np.asarray(out["rasterized_segments"])
    assert segs.min() >= 1  # 0 is reserved for 'fake'
    assert (segs > 1).any(), "body must cover some pixels"
    assert (segs == 1).any(), "background must exist"


def test_preprocessor_rotation_changes_camera(tiny):
    meta, smpl, ds, pre, batch = tiny
    out0 = pre.forward_with_rotation(
        batch, jnp.zeros((2,)), jnp.zeros((2,)), jnp.zeros((2,)))
    out1 = pre.forward_with_rotation(
        batch, jnp.full((2,), 0.5), jnp.zeros((2,)), jnp.zeros((2,)))
    assert np.abs(
        np.asarray(out0["cam2world_matrices"]) - np.asarray(out1["cam2world_matrices"])
    ).max() > 1e-3
    # body pixels move when the camera rotates
    assert (np.asarray(out0["rasterized_segments"]) != np.asarray(out1["rasterized_segments"])).any()


@pytest.mark.heavy
def test_generator_forward_shapes(tiny):
    meta, smpl, ds, pre, batch = tiny
    rng = jax.random.PRNGKey(1)
    cond = pre(batch, rotate=False, rng=rng)
    params, state = init_generator(rng, meta)
    z = jax.random.normal(rng, (2, meta["latent_dim"]))
    out, new_state = generator_forward(params, state, z, cond, rng, meta, train=True)
    H, W = meta["gen_height"], meta["gen_width"]
    assert out["rgbs"].shape == (2, H, W, 3)
    assert out["rgbs_render"].shape == (2, meta["render_height"], meta["render_width"], 3)
    assert np.isfinite(np.asarray(out["rgbs"])).all()
    # BN state advanced
    c = new_state["synthesis_network"]["blocks"][0]["spade_0"]["norm"]["count"]
    assert int(c) == 1


def test_staged_forward_truncation_and_depth(tiny):
    meta, smpl, ds, pre, batch = tiny
    rng = jax.random.PRNGKey(2)
    cond = pre(batch, rotate=False, rng=rng)
    params, state = init_generator(rng, meta)
    z = jax.random.normal(rng, (2, meta["latent_dim"]))
    meta_eval = dict(meta)
    meta_eval["nerf_noise"] = 0
    out, _ = staged_forward(params, state, z, cond, rng, meta_eval, truncation_psi=0.7)
    assert out["depths"].shape == (2, meta["render_height"], meta["render_width"], 1)
    d = np.asarray(out["depths"])
    assert d.min() >= -1.0 and d.max() <= 1.0


@pytest.mark.slow
def test_train_step_pair_runs_and_updates(tiny):
    meta, smpl, ds, pre, batch = tiny
    rng = jax.random.PRNGKey(3)
    ts = init_train_state(rng, meta)
    # with gan_lambda=0 the prediction head gets exactly-zero grads (same as
    # the reference's `pred.sum() * 0` trick) -> check the segmentation head
    before = np.asarray(ts.params_D["output_layer"]["w"]).copy()
    g_before = np.asarray(
        ts.params_G["synthesis_network"]["blocks"][0]["conv_0"]["w"]).copy()

    phase = meta["phases"][3]  # do_r1 phase
    ts2, stats = train_step_pair(
        ts, batch, rng, meta, pre, phase, lr_g=1e-4, lr_d=4e-4, nerf_noise=1.0)

    assert int(ts2.step) == 1
    after = np.asarray(ts2.params_D["output_layer"]["w"])
    g_after = np.asarray(ts2.params_G["synthesis_network"]["blocks"][0]["conv_0"]["w"])
    assert np.abs(after - before).max() > 0, "D params must update"
    assert np.abs(g_after - g_before).max() > 0, "G params must update"
    assert "d_loss" in stats and "g_loss" in stats
    d_loss = float(stats["d_loss"][1] / stats["d_loss"][0])
    assert np.isfinite(d_loss)
    # EMA moved toward params
    assert int(ts2.ema["count"]) == 1


def test_second_step_reuses_compilation(tiny):
    meta, smpl, ds, pre, batch = tiny
    rng = jax.random.PRNGKey(4)
    ts = init_train_state(rng, meta)
    phase = meta["phases"][0]
    ts, _ = train_step_pair(ts, batch, rng, meta, pre, phase, 1e-4, 4e-4, 1.0)
    # same phase flags, new meta dict with identical content -> cache hit
    import copy
    meta2 = copy.deepcopy(meta)
    ts, _ = train_step_pair(ts, batch, jax.random.PRNGKey(5), meta2, pre, phase, 1e-4, 4e-4, 0.9)
    assert int(ts.step) == 2


@pytest.mark.slow
def test_hierarchical_sampling_path(tiny):
    meta, smpl, ds, pre, batch = tiny
    meta_h = dict(meta)
    meta_h["hierarchical_sample"] = True
    rng = jax.random.PRNGKey(7)
    cond = pre(batch, rotate=False, rng=rng)
    params, state = init_generator(rng, meta_h)
    z = jax.random.normal(rng, (2, meta["latent_dim"]))
    out, _ = generator_forward(params, state, z, cond, rng, meta_h, train=True)
    assert out["rgbs"].shape == (2, meta["gen_height"], meta["gen_width"], 3)
    assert np.isfinite(np.asarray(out["rgbs"])).all()
    # gradients flow through the hierarchical merge
    def loss(p):
        o, _ = generator_forward(p, state, z, cond, rng, meta_h, train=True)
        return jnp.mean(o["rgbs"] ** 2)
    g = jax.grad(loss)(params)
    gn = float(jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(g))))
    assert np.isfinite(gn) and gn > 0


@pytest.mark.heavy
def test_dual_discrimination_step(tiny):
    meta, smpl, ds, pre, batch = tiny
    meta_d = dict(meta)
    meta_d["dual_discrimination"] = True
    rng = jax.random.PRNGKey(11)
    ts = init_train_state(rng, meta_d)
    phase = meta["phases"][0]
    ts2, stats = train_step_pair(
        ts, batch, rng, meta_d, pre, phase, lr_g=1e-4, lr_d=4e-4, nerf_noise=1.0)
    assert int(ts2.step) == 1
    d_loss = float(stats["d_loss"][1] / stats["d_loss"][0])
    assert np.isfinite(d_loss)


@pytest.mark.heavy
def test_batch_split_step(tiny):
    meta, smpl, ds, pre, batch = tiny
    meta_s = dict(meta)
    meta_s["batch_split"] = 2
    rng = jax.random.PRNGKey(13)
    ts = init_train_state(rng, meta_s)
    phase = meta["phases"][0]
    ts2, stats = train_step_pair(
        ts, batch, rng, meta_s, pre, phase, lr_g=1e-4, lr_d=4e-4, nerf_noise=1.0)
    assert int(ts2.step) == 1
    assert np.isfinite(float(stats["g_loss"][1]))
