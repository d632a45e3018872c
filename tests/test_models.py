"""Model component tests: SIREN field, mapping nets, synthesis stack, D.

Checks shape contracts (SURVEY.md §2/§3) and the math invariants that pin
reference semantics (freq*15+30, demodulation, SPADE gamma/beta, skip
gating, spectral norm)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threedhumangan_tpu.models import mapping, siren, synthesis as syn
from threedhumangan_tpu.models.discriminator import discriminator_forward, init_discriminator


# ---------------------------------------------------------------------------
# SIREN field
# ---------------------------------------------------------------------------


def test_siren_output_layout(rng):
    H, G, F, NB = 32, 31, 16, 4
    params = siren.init_coordconcat_siren(
        rng, input_dim=3, hidden_dim=H, geo_feature_dim=G, feature_dim=F, num_blocks=NB)
    B, P = 2, 40
    k1, k2, k3 = jax.random.split(rng, 3)
    pts = jax.random.normal(k1, (B, P, 3))
    geo = jax.random.normal(k2, (B, P, G))
    dirs = jax.random.normal(k3, (B, P, 3))
    freq = jnp.zeros((B, NB * H))
    phase = jnp.zeros((B, NB * H))
    out = siren.apply_coordconcat_siren(params, pts, freq, phase, geo, dirs)
    assert out.shape == (B, P, 3 + F + 1)
    # rgb channels are sigmoid outputs in (0, 1)
    rgb = np.asarray(out[..., :3])
    assert (rgb > 0).all() and (rgb < 1).all()


def test_siren_frequency_conditioning_changes_output(rng):
    H, G, F, NB = 16, 8, 8, 4
    params = siren.init_coordconcat_siren(rng, 3, H, G, F, NB)
    B, P = 1, 10
    pts = jnp.ones((B, P, 3)) * 0.3
    geo = jnp.ones((B, P, G)) * 0.1
    dirs = jnp.zeros((B, P, 3))
    out0 = siren.apply_coordconcat_siren(params, pts, jnp.zeros((B, NB * H)), jnp.zeros((B, NB * H)), geo, dirs)
    out1 = siren.apply_coordconcat_siren(params, pts, 0.5 * jnp.ones((B, NB * H)), jnp.zeros((B, NB * H)), geo, dirs)
    assert np.abs(np.asarray(out0) - np.asarray(out1)).max() > 1e-4


def test_siren_bounded_activations(rng):
    # trunk activations are sin(...) in [-1,1]; features are a linear head of
    # a bounded input with small init -> outputs stay O(1)
    H, G, F, NB = 32, 31, 16, 4
    params = siren.init_coordconcat_siren(rng, 3, H, G, F, NB)
    B, P = 2, 64
    pts = 10 * jax.random.normal(rng, (B, P, 3))
    geo = jax.random.normal(rng, (B, P, G))
    dirs = jax.random.normal(rng, (B, P, 3))
    freq = jax.random.normal(rng, (B, NB * H))
    phase = jax.random.normal(rng, (B, NB * H))
    out = siren.apply_coordconcat_siren(params, pts, freq, phase, geo, dirs)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out[..., 3:-1])).max() < 50


# ---------------------------------------------------------------------------
# mapping networks
# ---------------------------------------------------------------------------


def test_mapping_network_split(rng):
    latent, hidden, blocks = 16, 32, 4
    params = mapping.init_mapping_network(rng, latent, hidden, 2 * blocks * hidden)
    z = jax.random.normal(rng, (3, latent))
    freq, phase = mapping.apply_mapping_network(params, z)
    assert freq.shape == (3, blocks * hidden)
    assert phase.shape == (3, blocks * hidden)


def test_mapping_network_input_normalization(rng):
    # scaling z must not change the output (2nd-moment normalized input)
    params = mapping.init_mapping_network(rng, 8, 16, 32)
    z = jax.random.normal(rng, (2, 8))
    f1, p1 = mapping.apply_mapping_network(params, z)
    f2, p2 = mapping.apply_mapping_network(params, 100.0 * z)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-4)


def test_two_part_mapping_shapes_and_equalized_lr(rng):
    params = mapping.init_two_part_mapping_network(
        rng, z_dim=16, w_dim=24, implicit_dim=1, num_ws=1, trunk_layers=7, branch_layers=1)
    z = jax.random.normal(rng, (5, 16))
    xi, xs = mapping.apply_two_part_mapping_network(params, z)
    assert xi.shape == (5, 1)
    assert xs.shape == (5, 1, 24)
    # equalized lr: raw weights have std ~ 1/lr_mul = 100
    w_std = float(jnp.std(params["trunk"][0]["w"]))
    assert 50 < w_std < 200


# ---------------------------------------------------------------------------
# synthesis layers
# ---------------------------------------------------------------------------


def test_spatial_style_mod_matches_naive_einsum(rng):
    B, N, Cin, Cout, S = 2, 12, 8, 6, 8
    k1, k2, k3 = jax.random.split(rng, 3)
    p = syn.init_spatial_style_mod(k1, Cin, Cout, S)
    x = jax.random.normal(k2, (B, N, Cin))
    style = jax.random.normal(k3, (B, N, S))
    out = syn.apply_spatial_style_mod(p, x, style)

    # naive oracle (the reference's (B,N,in,out) formulation, map3d_layers:60-80)
    affine = np.asarray(style) @ np.asarray(p["affine"]["w"]) + np.asarray(p["affine"]["b"])
    mod = affine + 1
    w = np.asarray(p["weight"])[None, None] * mod[..., None]  # (B,N,in,out)
    demod = 1.0 / np.sqrt((w ** 2).sum(axis=2, keepdims=True) + 1e-8)
    w = w * demod
    expected = (np.asarray(x)[..., None] * w).sum(axis=2) + np.asarray(p["bias"])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-5)


def test_sync_batch_norm_train_vs_eval(rng):
    params, state = syn.init_sync_batch_norm(4)
    x = jax.random.normal(rng, (8, 6, 5, 4)) * 3 + 1
    y, new_state = syn.apply_sync_batch_norm(params, state, x, train=True)
    # batch-stat normalization -> zero mean unit var
    np.testing.assert_allclose(np.asarray(y).mean((0, 1, 2)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y).std((0, 1, 2)), 1.0, atol=1e-3)
    assert float(new_state["count"]) == 1
    # running stats moved toward batch stats
    assert np.abs(np.asarray(new_state["mean"])).max() > 0

    y_eval, same_state = syn.apply_sync_batch_norm(params, new_state, x, train=False)
    assert float(same_state["count"]) == 1


def test_adaptive_batch_norm_uses_running_stats(rng):
    params, state = syn.init_adaptive_batch_norm(3)
    x = jax.random.normal(rng, (4, 5, 5, 3)) * 2 + 5
    y, new_state = syn.apply_adaptive_batch_norm(params, state, x, train=True)
    # normalizes by the *updated running* stats (momentum 0.05), NOT batch
    # stats -> output mean far from 0 on the first step (ref :134-148)
    assert abs(float(jnp.mean(y))) > 1.0
    # gradients do not flow through the stats
    g = jax.grad(lambda xx: jnp.sum(syn.apply_adaptive_batch_norm(params, state, xx, True)[0]))(x)
    expected = 1.0 / np.sqrt(np.asarray(new_state["var"]) + 1e-5)
    np.testing.assert_allclose(np.asarray(g)[0, 0, 0], expected, rtol=1e-4)


def test_spectral_norm_unit_sigma(rng):
    w = 5.0 * jax.random.normal(rng, (12, 8))
    state = syn.init_spectral_state(rng, 8)
    for _ in range(30):
        w_bar, state = syn.spectral_normalize(w, state, train=True)
    sigma = np.linalg.svd(np.asarray(w_bar), compute_uv=False)[0]
    np.testing.assert_allclose(sigma, 1.0, rtol=1e-3)


def test_spade_block_shapes_and_state(rng):
    B, H, W, Cin, Cout, S = 2, 8, 4, 6, 10, 12
    params, state = syn.init_spade_block(rng, Cin, Cout, S, normalization="batch_norm")
    x = jax.random.normal(rng, (B, H, W, Cin))
    style = jax.random.normal(rng, (B, H, W, S))
    y, new_state = syn.apply_spade_block(params, state, x, style, "batch_norm", train=True)
    assert y.shape == (B, H, W, Cout)
    assert float(new_state["spade_0"]["norm"]["count"]) == 1

    # global (B,1,C) style broadcast
    gstyle = jax.random.normal(rng, (B, 1, S))
    y2, _ = syn.apply_spade_block(params, state, x, gstyle, "batch_norm", train=False)
    assert y2.shape == (B, H, W, Cout)


def test_synthesis_network_modes(rng):
    B, H, W, C = 1, 8, 4, 12
    for mode in ["all", "mixed", "isolated"]:
        params, state, meta = syn.init_synthesis_network(
            rng, input_dim=C, style_dim=C, hidden_dim=C, num_blocks=4,
            mod_blocks=(0, 1), spatial_normalization="batch_norm", map3d_mode=mode)
        x = jax.random.normal(rng, (B, H, W, C))
        style = jax.random.normal(rng, (B, H, W, C))
        fixed = jax.random.normal(rng, (B, 1, C))
        out, new_state = syn.apply_synthesis_network(
            params, state, meta, x, style, fixed, train=True)
        assert out["final"].shape == (B, H, W, 3)


def test_synthesis_network_pixelwise_mode(rng):
    B, H, W, C = 1, 4, 4, 8
    params, state, meta = syn.init_synthesis_network(
        rng, input_dim=C, style_dim=C, hidden_dim=C, num_blocks=4,
        mod_blocks=(0, 1), spatial_normalization="none", map3d_mode="isolated")
    x = jax.random.normal(rng, (B, H, W, C))
    style = jax.random.normal(rng, (B, H, W, C))
    fixed = jax.random.normal(rng, (B, 1, C))
    out, _ = syn.apply_synthesis_network(params, state, meta, x, style, fixed)
    assert out["final"].shape == (B, H, W, 3)


def test_get_2d_coords_layout():
    c = syn.get_2d_coords(1, 4, 3)
    assert c.shape == (1, 4, 3, 2)
    np.testing.assert_allclose(np.asarray(c)[0, 0, 0], [-1, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c)[0, -1, -1], [1, 1], atol=1e-6)
    # channel 0 = row coord (constant along W)
    np.testing.assert_allclose(np.asarray(c)[0, 2, :, 0], np.asarray(c)[0, 2, 0, 0], atol=1e-6)


# ---------------------------------------------------------------------------
# discriminator
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def disc():
    meta = {"latent_dim": 32, "label_dim": 26, "semantic_dim": 0,
            "gen_height": 64, "gen_width": 32}
    key = jax.random.PRNGKey(0)
    params, state = init_discriminator(key, meta)
    return params, state, meta


@pytest.mark.heavy
def test_discriminator_heads(disc):
    params, state, meta = disc
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32, 3))
    out, new_state = discriminator_forward(params, state, x, train=True)
    assert out["prediction"].shape == (2, 64, 32, 1)
    assert out["segments"].shape == (2, 64, 32, 26)
    assert out["latents"].shape == (2, 32)
    # num_blocks = min(6, log2(64)-1) = 5
    assert len(params["down"]) == 5


@pytest.mark.slow
def test_discriminator_r1_grad_is_finite(disc):
    params, state, meta = disc
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 32, 3))

    def scalar(img):
        out, _ = discriminator_forward(params, state, img, train=False)
        return jnp.sum(jax.nn.softmax(out["segments"], axis=-1))

    g = jax.grad(scalar)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
