"""Checkpoint-converter test: a synthetic state_dict under the reference's
key names (apps/sample_from_generator.py:109-111 key space) must land on our
pytree with matching shapes and produce a working forward pass."""

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
