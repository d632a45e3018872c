"""Utility-layer tests: debug helpers, EMA, checkpointing, stats, CIPS."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threedhumangan_tpu.models import cips_layers
from threedhumangan_tpu.parallel.stats import Collector, moments
from threedhumangan_tpu.utils import checkpoint as ckpt
from threedhumangan_tpu.utils import debug
from threedhumangan_tpu.utils.ema import ema_init, ema_update
from threedhumangan_tpu.utils.misc import normalize_2nd_moment, positional_encoding


def test_assert_shape():
    x = jnp.zeros((2, 3, 4))
    debug.assert_shape(x, [2, None, 4])
    with pytest.raises(AssertionError):
        debug.assert_shape(x, [2, 3])
    with pytest.raises(AssertionError):
        debug.assert_shape(x, [2, 3, 5])


def test_count_params_and_summary():
    tree = {"a": {"w": jnp.zeros((3, 4)), "b": jnp.zeros((4,))}, "c": jnp.zeros((5,))}
    assert debug.count_params(tree) == 12 + 4 + 5
    out = debug.print_module_summary(tree, max_depth=1)
    assert "21" in out


def test_ema_warmup_decay():
    params = {"w": jnp.zeros((3,))}
    ema = ema_init(params)
    new_params = {"w": jnp.ones((3,))}
    ema = ema_update(ema, new_params, decay=0.999)
    # first update: decay = min(0.999, 2/11)
    expected = 1.0 - 2.0 / 11.0
    np.testing.assert_allclose(np.asarray(ema["params"]["w"]), expected, rtol=1e-5)


def test_checkpoint_roundtrip_and_prune(tmp_path):
    d = str(tmp_path)
    for step in (1000, 2000, 5000):
        ckpt.save_checkpoint(d, step, {"x": {"w": np.ones((2,)) * step}}, keep_interval=5000)
    # pruning on save: only multiples of 5000 survive except the newest write
    latest = ckpt.latest_checkpoint(d)
    payload = ckpt.load_checkpoint(latest)
    assert payload["step"] == 5000
    files = sorted(os.listdir(d))
    assert files == ["00005000_checkpoint.npz"]


def test_checkpoint_namedtuple_nodes_and_partial_load(tmp_path):
    """optax opt-state NamedTuples survive the npz round trip; ``only=``
    skips unrequested array leaves without disturbing structure."""
    import optax

    opt = optax.scale_by_adam()
    params = {"a": jnp.ones((3,)), "b": {"c": jnp.zeros((2, 2))}}
    payload = {
        "train_state": {
            "params_G": params,
            "opt_G": opt.init(params),
            "note": "hello",
            "shapes": [1, (2, 3), None],
        }
    }
    path = ckpt.save_checkpoint(str(tmp_path), 7, payload, keep_interval=1)
    assert path.endswith(".npz")

    full = ckpt.load_checkpoint(path)
    assert isinstance(full["train_state"]["opt_G"], optax.ScaleByAdamState)
    np.testing.assert_array_equal(
        full["train_state"]["opt_G"].mu["b"]["c"], np.zeros((2, 2)))
    assert full["train_state"]["note"] == "hello"
    assert full["train_state"]["shapes"] == [1, (2, 3), None]

    part = ckpt.load_checkpoint(path, only=["/train_state/params_G"])
    np.testing.assert_array_equal(part["train_state"]["params_G"]["a"],
                                  np.ones((3,)))
    assert part["train_state"]["opt_G"].mu["a"] is None  # skipped leaf
    assert part["train_state"]["note"] == "hello"  # py leaves always load


def test_collector_moments():
    c = Collector(".*")
    c.update({"loss": np.asarray(moments(jnp.asarray([1.0, 2.0, 3.0])))})
    c.update({"loss": np.asarray(moments(jnp.asarray([5.0])))})
    assert c.num("loss") == 4
    np.testing.assert_allclose(c["loss"], 11.0 / 4)
    assert c.std("loss") > 0


def test_positional_encoding_shape():
    x = jnp.ones((2, 3))
    enc = positional_encoding(x, L=4)
    assert enc.shape == (2, 2 * 4 * 3)


def test_normalize_2nd_moment():
    x = jnp.asarray([[3.0, 4.0]])
    y = normalize_2nd_moment(x)
    np.testing.assert_allclose(float(jnp.mean(jnp.square(y))), 1.0, rtol=1e-4)


def test_cips_modulated_linear(rng):
    p = cips_layers.init_modulated_linear(rng, 6, 8, 4)
    x = jax.random.normal(rng, (2, 10, 6))
    s = jax.random.normal(rng, (2, 4))
    out = cips_layers.apply_modulated_linear(p, x, s)
    assert out.shape == (2, 10, 8)
    # demodulation: per-sample effective weight columns are unit-norm
    mod = np.asarray(s @ p["affine"]["w"] + p["affine"]["b"] + 1)
    w = np.asarray(p["weight"])[None] * mod[:, :, None]
    w = w / np.sqrt((w ** 2).sum(1, keepdims=True) + 1e-8)
    np.testing.assert_allclose((w ** 2).sum(1), 1.0, rtol=1e-3)


def test_cips_attention_linear(rng):
    p = cips_layers.init_attention_linear(rng, 6, 8, 4, n_banks=3)
    x = jax.random.normal(rng, (2, 5, 6))
    s = jax.random.normal(rng, (2, 4))
    out = cips_layers.apply_attention_linear(p, x, s)
    assert out.shape == (2, 5, 8)


def test_easydict_and_grid():
    from threedhumangan_tpu.data.utils import EasyDict, make_grid, stitch_images

    d = EasyDict(a=1)
    d.b = 2
    assert d.a == 1 and d["b"] == 2

    imgs = np.zeros((5, 4, 4, 3), np.float32)
    grid = make_grid(imgs, nrow=3, pad=1)
    assert grid.shape == (2 * 5 + 1, 3 * 5 + 1, 3)
    st = stitch_images([imgs[0], imgs[1]], axis=1)
    assert st.shape == (4, 8, 3)


def test_native_dataloader_matches_numpy():
    from threedhumangan_tpu.data import native

    rs = np.random.RandomState(0)
    rgb = rs.randint(0, 256, (16, 12, 3), np.uint8)
    mask = (rs.rand(16, 12) > 0.3).astype(np.uint8) * 255

    out = native.normalize_masked_image(rgb, mask)
    expected = rgb.astype(np.float32) / 127.5 - 1.0
    expected[mask == 0] = 1.0
    np.testing.assert_allclose(out, expected, atol=1e-6)

    seg = rs.randint(0, 5, (8, 8)).astype(np.int64)
    shifted = native.shift_segment_labels(seg.copy())
    exp = seg.copy()
    exp[seg > 0] += 1
    exp[seg == 0] = 1
    np.testing.assert_array_equal(shifted, exp)

    # resize sanity: nearest keeps the value set, bilinear keeps range
    img = rs.randint(0, 256, (9, 7, 3), np.uint8)
    nn = native.resize_u8(img, 18, 14, nearest=True)
    assert nn.shape == (18, 14, 3)
    assert set(np.unique(nn)).issubset(set(np.unique(img)))
    bl = native.resize_u8(img, 5, 4, nearest=False)
    assert bl.shape == (5, 4, 3)
    assert bl.min() >= img.min() - 1 and bl.max() <= img.max() + 1


def test_prefetch_iterator():
    from threedhumangan_tpu.data.prefetch import prefetch

    items = list(prefetch(iter(range(7)), depth=3))
    assert items == list(range(7))

    def failing():
        yield 1
        raise ValueError("boom")

    it = prefetch(failing())
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)


def test_frechet_distance_math():
    from threedhumangan_tpu.utils.fid import compute_statistics, frechet_distance

    rs = np.random.RandomState(0)
    a = rs.randn(500, 8)
    b = rs.randn(500, 8) + 2.0
    mu_a, s_a = compute_statistics(a)
    mu_b, s_b = compute_statistics(b)
    # identical distributions -> ~0
    assert frechet_distance(mu_a, s_a, mu_a, s_a) < 1e-8
    # mean shift of 2 in 8 dims -> ~= 8 * 4 = 32
    d = frechet_distance(mu_a, s_a, mu_b, s_b)
    assert 25 < d < 40


@pytest.mark.heavy
def test_fid_between_images():
    from threedhumangan_tpu.utils.fid import fid_between

    rs = np.random.RandomState(1)
    a = rs.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32)
    b = a + 0.5
    same = fid_between(a, a)
    diff = fid_between(a, b)
    assert same < 1e-6
    assert diff > same


def test_export_vgg16_npz_roundtrip(tmp_path):
    """export_weights -> init_vgg16_features roundtrip: a synthetic
    torchvision-layout state_dict converts to the npz our perceptual loss
    loads, with OIHW->HWIO transposed weights."""
    import numpy as np

    from threedhumangan_tpu.trainers.perceptual import init_vgg16_features, vgg16_features
    from threedhumangan_tpu.utils.export_weights import export_vgg16_npz

    rs = np.random.RandomState(0)
    plan = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
            (256, 256), (256, 512), (512, 512), (512, 512)]
    conv_feature_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21]
    sd = {}
    for fi, (cin, cout) in zip(conv_feature_idx, plan):
        sd[f"features.{fi}.weight"] = rs.randn(cout, cin, 3, 3).astype(np.float32)
        sd[f"features.{fi}.bias"] = rs.randn(cout).astype(np.float32)

    path = str(tmp_path / "vgg16.npz")
    assert export_vgg16_npz(path, state_dict=sd) == 10

    convs = init_vgg16_features(path)
    assert len(convs) == 10
    for conv, (cin, cout) in zip(convs, plan):
        assert conv["w"].shape == (3, 3, cin, cout)
        assert conv["b"].shape == (cout,)
    np.testing.assert_allclose(
        np.asarray(convs[0]["w"]),
        sd["features.0.weight"].transpose(2, 3, 1, 0))

    import jax.numpy as jnp
    taps = vgg16_features(convs, jnp.ones((1, 32, 16, 3)) * 0.5)
    assert [t.shape[-1] for t in taps] == [64, 128, 256, 512]
