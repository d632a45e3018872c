"""Checkpoint-converter tests: a synthetic state_dict under the reference's
key names (apps/sample_from_generator.py:109-111 key space) must land on our
pytree with matching shapes, produce a working forward pass, and — the
numeric half — converted spectral-norm / BN state must reproduce torch
outputs exactly.  The full converted-generator forward is additionally
pinned against the imported reference torch model end-to-end in
tests/test_reference_parity.py::test_full_generator_forward_parity."""

import jax
import jax.numpy as jnp
import numpy as np

from threedhumangan_tpu import configs
from threedhumangan_tpu.models.generator import generator_forward, init_generator
from threedhumangan_tpu.utils.torch_convert import convert_generator_state_dict


def _reference_keyspace_state_dict(meta):
    """Build name->array dict with the reference Map3DGenerator key names."""
    rs = np.random.RandomState(0)
    L, H, F = meta["latent_dim"], meta["hidden_dim"], meta["feature_dim"]
    G = meta["geo_feature_dim"]
    NB = meta["neural_field_blocks"]
    SB = meta["synthesis_blocks"]
    sd = {}

    def lin(prefix, i, o):
        sd[prefix + ".weight"] = rs.randn(o, i).astype(np.float32)
        sd[prefix + ".bias"] = rs.randn(o).astype(np.float32)

    def conv(prefix, i, o, spectral=False):
        wname = ".weight_orig" if spectral else ".weight"
        sd[prefix + wname] = rs.randn(o, i, 1, 1).astype(np.float32)
        sd[prefix + ".bias"] = rs.randn(o).astype(np.float32)
        if spectral:
            sd[prefix + ".weight_u"] = rs.randn(o).astype(np.float32)

    # neural field
    lin("neural_field.first_layer_coord.layer", 3, H)
    lin("neural_field.first_layer_mod.layer", G, H)
    lin("neural_field.network.0.layer", 2 * H, H)
    for i in range(1, NB):
        lin(f"neural_field.network.{i}.layer", H, H)
    lin("neural_field.sigma_layer", H, 1)
    lin("neural_field.color_layer_sine.layer", H + 3, H)
    lin("neural_field.color_layer_linear", H, 3)
    lin("neural_field.feature_layer_linear", H, F)

    # inputs
    conv("synthesis_input.network.0", 2, F)
    conv("synthesis_style_input.from_coords.0", 1, L)
    conv("synthesis_style_input.network.0", 2 * L, F)
    conv("synthesis_style_input.network.2", F, F)

    # synthesis blocks
    in_dim = F
    for b in range(SB):
        pre = f"synthesis_network.network.m3d_{b}"
        conv(pre + ".conv_0", in_dim, H, spectral=True)
        conv(pre + ".conv_1", H, H, spectral=True)
        for s, dim in ((0, in_dim), (1, H)):
            sp = f"{pre}.spade_{s}"
            conv(sp + ".mlp_shared.0", F, 128)
            conv(sp + ".mlp_gamma", 128, dim)
            conv(sp + ".mlp_beta", 128, dim)
            sd[sp + ".first_norm.weight"] = np.ones(dim, np.float32)
            sd[sp + ".first_norm.bias"] = np.zeros(dim, np.float32)
            sd[sp + ".first_norm.running_mean"] = np.zeros(dim, np.float32)
            sd[sp + ".first_norm.running_var"] = np.ones(dim, np.float32)
            sd[sp + ".first_norm.num_batches_tracked"] = np.int64(7)
        conv(f"synthesis_network.to_rgbs.m3d_{b}.linear", H, 3)
        in_dim = H

    # mapping networks
    lin("neural_field_mapping_network.network.0", L, H)
    lin("neural_field_mapping_network.network.2", H, H)
    lin("neural_field_mapping_network.network.4", H, H)
    lin("neural_field_mapping_network.network.6", H, 2 * NB * H)
    for t in range(7):
        lin(f"synthesis_mapping_network.trunk{t}", L if t == 0 else F, F)
    lin("synthesis_mapping_network.implicit0", F, 1)
    lin("synthesis_mapping_network.superres0", F, F)

    sd["latent_pool.latents"] = rs.randn(meta["dataset_length"], L).astype(np.float32)
    return sd


def test_convert_matches_init_tree_shapes():
    meta = configs.extract_metadata(configs.MAP3DBN_TINY, 0)
    sd = _reference_keyspace_state_dict(meta)
    params, state = convert_generator_state_dict(sd, meta)
    ref_params, ref_state = init_generator(jax.random.PRNGKey(0), meta)

    ref_shapes = jax.tree.map(jnp.shape, ref_params)
    got_shapes = jax.tree.map(jnp.shape, params)
    assert jax.tree.structure(ref_shapes) == jax.tree.structure(got_shapes)
    mismatches = [
        (p, a, b) for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_shapes),
            jax.tree_util.tree_leaves_with_path(got_shapes))
        if a != b
    ]
    assert not mismatches, mismatches[:5]


def test_converted_params_run_forward():
    meta = dict(configs.extract_metadata(configs.MAP3DBN_TINY, 0))
    meta["nerf_noise"] = 0
    sd = _reference_keyspace_state_dict(meta)
    params, state = convert_generator_state_dict(sd, meta)

    from threedhumangan_tpu.data.dataset import SyntheticSHHQDataset, iterate_batches
    from threedhumangan_tpu.data.preprocessor import get_preprocessor
    from threedhumangan_tpu.models.smpl import synthetic_smpl_model

    smpl = synthetic_smpl_model(num_verts=96, num_faces=64)
    ds = SyntheticSHHQDataset(smpl_model=smpl, **meta)
    pre = get_preprocessor(meta, smpl_model=smpl)
    batch = next(iterate_batches(ds, 1, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)
    cond = pre(batch, rotate=False, rng=rng)
    z = jax.random.normal(rng, (1, meta["latent_dim"]))
    out, _ = generator_forward(params, state, z, cond, rng, meta)
    assert np.isfinite(np.asarray(out["rgbs"])).all()


def test_converted_spectral_norm_output_parity():
    """OUTPUT parity of the spectral-norm mapping (weight_orig + weight_u ->
    params w + state u): our eval-mode spectral_normalize on the converted
    tree must reproduce a converged torch spectral_norm conv exactly."""
    torch = __import__("pytest").importorskip("torch")
    from threedhumangan_tpu.models.synthesis import spectral_normalize

    meta = configs.extract_metadata(configs.MAP3DBN_TINY, 0)
    sd = _reference_keyspace_state_dict(meta)

    F, H = meta["feature_dim"], meta["hidden_dim"]
    torch.manual_seed(0)
    conv = torch.nn.utils.spectral_norm(torch.nn.Conv2d(F, H, 1))
    with torch.no_grad():
        warm = torch.randn(1, F, 4, 4)
        for _ in range(50):  # converge the power iteration
            conv(warm)
    conv.eval()

    pre = "synthesis_network.network.m3d_0.conv_0"
    sd[pre + ".weight_orig"] = conv.weight_orig.detach().numpy()
    sd[pre + ".weight_u"] = conv.weight_u.detach().numpy()
    sd[pre + ".bias"] = conv.bias.detach().numpy()

    params, state = convert_generator_state_dict(sd, meta)
    bp = params["synthesis_network"]["blocks"][0]["conv_0"]
    bs = state["synthesis_network"]["blocks"][0]["conv_0"]

    x = torch.randn(2, F, 5, 3)
    with torch.no_grad():
        ref = conv(x).numpy().transpose(0, 2, 3, 1)  # NHWC

    w_bar, _ = spectral_normalize(bp["w"], bs, train=False)
    ours = np.asarray(x.numpy().transpose(0, 2, 3, 1) @ np.asarray(w_bar)
                      + np.asarray(bp["b"]))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_converted_bn_running_stats_output_parity():
    """OUTPUT parity of the BN state mapping (running_mean/var + affine ->
    norm state/params): our eval-mode sync BN on the converted tree must
    reproduce torch BatchNorm2d eval output exactly."""
    torch = __import__("pytest").importorskip("torch")
    from threedhumangan_tpu.models.synthesis import apply_sync_batch_norm

    meta = configs.extract_metadata(configs.MAP3DBN_TINY, 0)
    sd = _reference_keyspace_state_dict(meta)

    F = meta["feature_dim"]
    rs = np.random.RandomState(42)
    sp = "synthesis_network.network.m3d_0.spade_0"
    stats = {
        ".first_norm.running_mean": rs.randn(F).astype(np.float32),
        ".first_norm.running_var": (rs.rand(F) + 0.5).astype(np.float32),
        ".first_norm.weight": rs.randn(F).astype(np.float32),
        ".first_norm.bias": rs.randn(F).astype(np.float32),
    }
    sd.update({sp + k: v for k, v in stats.items()})

    params, state = convert_generator_state_dict(sd, meta)
    bp = params["synthesis_network"]["blocks"][0]["spade_0"]
    bs = state["synthesis_network"]["blocks"][0]["spade_0"]

    bn = torch.nn.BatchNorm2d(F).eval()
    with torch.no_grad():
        bn.running_mean.copy_(torch.from_numpy(stats[".first_norm.running_mean"]))
        bn.running_var.copy_(torch.from_numpy(stats[".first_norm.running_var"]))
        bn.weight.copy_(torch.from_numpy(stats[".first_norm.weight"]))
        bn.bias.copy_(torch.from_numpy(stats[".first_norm.bias"]))
        x = torch.randn(2, F, 6, 4)
        ref = bn(x).numpy().transpose(0, 2, 3, 1)  # NHWC

    ours, _ = apply_sync_batch_norm(
        bp["norm"], bs["norm"], jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)
