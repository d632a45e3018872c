"""InceptionV3-pool3 FID extractor: topology, export round-trip, and the
asset-ready weight-loading path (VERDICT round-2 item #4 / missing #1)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from threedhumangan_tpu.utils.inception import (
    BN_EPS,
    CONV_TABLE,
    conv_input_channels,
    inception_pool3,
    init_random_inception,
    load_inception_npz,
)


def test_conv_table_matches_torchvision_topology():
    # 94 convs in torchvision inception_v3; spot-check block fan-ins
    assert len(CONV_TABLE) == 94
    ins = conv_input_channels()
    assert ins["Conv2d_1a_3x3"] == 3
    assert ins["Mixed_5b.branch1x1"] == 192
    assert ins["Mixed_5c.branch1x1"] == 256       # 224 + 32 pool
    assert ins["Mixed_5d.branch1x1"] == 288       # 224 + 64 pool
    assert ins["Mixed_6b.branch1x1"] == 768       # 384 + 96 + 288
    assert ins["Mixed_7b.branch1x1"] == 1280      # 320 + 192 + 768
    assert ins["Mixed_7c.branch1x1"] == 2048      # 320 + 768 + 768 + 192
    assert ins["Mixed_6c.branch7x7_2"] == 160     # chained c7 channel
    assert ins["Mixed_7b.branch3x3_2a"] == 384


def test_pool3_features_shape_and_determinism():
    params = init_random_inception(0)
    imgs = jnp.asarray(np.random.RandomState(0).randn(2, 64, 32, 3).astype(np.float32))
    f1 = inception_pool3(params, imgs)
    f2 = inception_pool3(params, imgs)
    assert f1.shape == (2, 2048)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    assert np.isfinite(np.asarray(f1)).all()
    # different images produce different features
    f3 = inception_pool3(params, imgs[::-1])
    assert not np.allclose(np.asarray(f1), np.asarray(f3))


@pytest.mark.heavy
def test_export_bn_folding_round_trip(tmp_path):
    """Synthesize a torchvision-layout state_dict, export with BN folding,
    and verify conv+foldedBN == conv+BN numerically on one layer."""
    from threedhumangan_tpu.utils.export_weights import export_inception_npz

    rng = np.random.RandomState(1)
    ins = conv_input_channels()
    sd = {}
    for name, out, kh, kw, _, _ in CONV_TABLE:
        sd[f"{name}.conv.weight"] = rng.randn(out, ins[name], kh, kw).astype(np.float32) * 0.05
        sd[f"{name}.bn.weight"] = rng.rand(out).astype(np.float32) + 0.5
        sd[f"{name}.bn.bias"] = rng.randn(out).astype(np.float32) * 0.1
        sd[f"{name}.bn.running_mean"] = rng.randn(out).astype(np.float32) * 0.1
        sd[f"{name}.bn.running_var"] = rng.rand(out).astype(np.float32) + 0.5

    path = str(tmp_path / "inception.npz")
    n = export_inception_npz(path, state_dict=sd)
    assert n == 94
    params = load_inception_npz(path)

    # layer-level check: folded conv == conv -> BN (eval) on Conv2d_1a_3x3
    name = "Conv2d_1a_3x3"
    x = rng.randn(1, 11, 11, 3).astype(np.float32)
    w_oihw = sd[f"{name}.conv.weight"]
    y_ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w_oihw.transpose(2, 3, 1, 0)), (2, 2),
        "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    scale = sd[f"{name}.bn.weight"] / np.sqrt(sd[f"{name}.bn.running_var"] + BN_EPS)
    y_ref = np.asarray(y_ref) * scale + (
        sd[f"{name}.bn.bias"] - sd[f"{name}.bn.running_mean"] * scale)

    y_fold = jax.lax.conv_general_dilated(
        jnp.asarray(x), params[name + ".w"], (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + params[name + ".b"]
    np.testing.assert_allclose(np.asarray(y_fold), y_ref, rtol=1e-4, atol=1e-5)

    # whole-network forward runs on the exported weights
    feats = inception_pool3(params, jnp.asarray(rng.randn(1, 32, 16, 3), jnp.float32))
    assert feats.shape == (1, 2048)
    assert np.isfinite(np.asarray(feats)).all()


def test_fid_auto_extractor_selects_inception(tmp_path, monkeypatch):
    from threedhumangan_tpu.utils.fid import get_extractor

    # no npz -> vgg fallback with a loud label
    monkeypatch.delenv("INCEPTION_WEIGHTS_NPZ", raising=False)
    _, label = get_extractor("auto")
    assert "VGG16" in label

    # with an npz present -> real inception label
    rng = np.random.RandomState(2)
    ins = conv_input_channels()
    arrs = {}
    for name, out, kh, kw, _, _ in CONV_TABLE:
        arrs[name + ".w"] = rng.randn(kh, kw, ins[name], out).astype(np.float32) * 0.05
        arrs[name + ".b"] = np.zeros(out, np.float32)
    path = str(tmp_path / "i.npz")
    np.savez(path, **arrs)
    monkeypatch.setenv("INCEPTION_WEIGHTS_NPZ", path)
    feats_fn, label = get_extractor("auto")
    assert "standard FID" in label
    out = feats_fn(jnp.zeros((1, 16, 8, 3)))
    assert out.shape == (1, 2048)
