"""InceptionV3 pool3 feature extractor (the standard FID feature space).

The reference never ships FID code (its eval TODO is unchecked,
/root/reference/README.md:19) but FID-vs-released-checkpoint is the headline
quality metric (BASELINE.md), so the TPU build carries the extractor.
Weights cannot be downloaded in this offline environment; the harness is
asset-ready instead:

  * ``load_inception_npz(path)`` loads a BN-folded npz produced by
    ``utils.export_weights.export_inception_npz`` from a torchvision
    ``inception_v3`` state_dict (run that once on a machine with the
    checkpoint, point ``INCEPTION_WEIGHTS_NPZ`` here);
  * ``init_random_inception(seed)`` builds the same pytree with fixed random
    weights so every code path is testable offline.

TPU-native design: one NHWC/HWIO conv stack under jit; BatchNorm is folded
into conv weights at export time (inference-only extractor), so the forward
is pure conv+relu+pool — no normalization state.  The topology is the
torchvision ``inception_v3`` eval graph through the final 8x8 average pool
(2048-d "pool3" features, the space published FID numbers use).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3  # torchvision BasicConv2d BatchNorm2d(eps=0.001)


def _a(name, pool):  # InceptionA conv table
    return [
        (f"{name}.branch1x1", 64, 1, 1, 1, (0, 0)),
        (f"{name}.branch5x5_1", 48, 1, 1, 1, (0, 0)),
        (f"{name}.branch5x5_2", 64, 5, 5, 1, (2, 2)),
        (f"{name}.branch3x3dbl_1", 64, 1, 1, 1, (0, 0)),
        (f"{name}.branch3x3dbl_2", 96, 3, 3, 1, (1, 1)),
        (f"{name}.branch3x3dbl_3", 96, 3, 3, 1, (1, 1)),
        (f"{name}.branch_pool", pool, 1, 1, 1, (0, 0)),
    ]


def _b(name):  # InceptionB
    return [
        (f"{name}.branch3x3", 384, 3, 3, 2, (0, 0)),
        (f"{name}.branch3x3dbl_1", 64, 1, 1, 1, (0, 0)),
        (f"{name}.branch3x3dbl_2", 96, 3, 3, 1, (1, 1)),
        (f"{name}.branch3x3dbl_3", 96, 3, 3, 2, (0, 0)),
    ]


def _c(name, c7):  # InceptionC
    return [
        (f"{name}.branch1x1", 192, 1, 1, 1, (0, 0)),
        (f"{name}.branch7x7_1", c7, 1, 1, 1, (0, 0)),
        (f"{name}.branch7x7_2", c7, 1, 7, 1, (0, 3)),
        (f"{name}.branch7x7_3", 192, 7, 1, 1, (3, 0)),
        (f"{name}.branch7x7dbl_1", c7, 1, 1, 1, (0, 0)),
        (f"{name}.branch7x7dbl_2", c7, 7, 1, 1, (3, 0)),
        (f"{name}.branch7x7dbl_3", c7, 1, 7, 1, (0, 3)),
        (f"{name}.branch7x7dbl_4", c7, 7, 1, 1, (3, 0)),
        (f"{name}.branch7x7dbl_5", 192, 1, 7, 1, (0, 3)),
        (f"{name}.branch_pool", 192, 1, 1, 1, (0, 0)),
    ]


def _d(name):  # InceptionD
    return [
        (f"{name}.branch3x3_1", 192, 1, 1, 1, (0, 0)),
        (f"{name}.branch3x3_2", 320, 3, 3, 2, (0, 0)),
        (f"{name}.branch7x7x3_1", 192, 1, 1, 1, (0, 0)),
        (f"{name}.branch7x7x3_2", 192, 1, 7, 1, (0, 3)),
        (f"{name}.branch7x7x3_3", 192, 7, 1, 1, (3, 0)),
        (f"{name}.branch7x7x3_4", 192, 3, 3, 2, (0, 0)),
    ]


def _e(name):  # InceptionE
    return [
        (f"{name}.branch1x1", 320, 1, 1, 1, (0, 0)),
        (f"{name}.branch3x3_1", 384, 1, 1, 1, (0, 0)),
        (f"{name}.branch3x3_2a", 384, 1, 3, 1, (0, 1)),
        (f"{name}.branch3x3_2b", 384, 3, 1, 1, (1, 0)),
        (f"{name}.branch3x3dbl_1", 448, 1, 1, 1, (0, 0)),
        (f"{name}.branch3x3dbl_2", 384, 3, 3, 1, (1, 1)),
        (f"{name}.branch3x3dbl_3a", 384, 1, 3, 1, (0, 1)),
        (f"{name}.branch3x3dbl_3b", 384, 3, 1, 1, (1, 0)),
        (f"{name}.branch_pool", 192, 1, 1, 1, (0, 0)),
    ]


# (name, out_ch, kh, kw, stride, (ph, pw)) for EVERY conv; input channels are
# derived by walking the graph, so the table alone pins all weight shapes.
CONV_TABLE: List[Tuple[str, int, int, int, int, Tuple[int, int]]] = (
    [
        ("Conv2d_1a_3x3", 32, 3, 3, 2, (0, 0)),
        ("Conv2d_2a_3x3", 32, 3, 3, 1, (0, 0)),
        ("Conv2d_2b_3x3", 64, 3, 3, 1, (1, 1)),
        ("Conv2d_3b_1x1", 80, 1, 1, 1, (0, 0)),
        ("Conv2d_4a_3x3", 192, 3, 3, 1, (0, 0)),
    ]
    + _a("Mixed_5b", 32) + _a("Mixed_5c", 64) + _a("Mixed_5d", 64)
    + _b("Mixed_6a")
    + _c("Mixed_6b", 128) + _c("Mixed_6c", 160) + _c("Mixed_6d", 160)
    + _c("Mixed_6e", 192)
    + _d("Mixed_7a")
    + _e("Mixed_7b") + _e("Mixed_7c")
)


def conv_input_channels() -> Dict[str, int]:
    """Input channel count per conv, derived from the graph topology."""
    ins: Dict[str, int] = {}
    # stem
    stem_in = {"Conv2d_1a_3x3": 3, "Conv2d_2a_3x3": 32, "Conv2d_2b_3x3": 32,
               "Conv2d_3b_1x1": 64, "Conv2d_4a_3x3": 80}
    ins.update(stem_in)
    block_in = {"Mixed_5b": 192, "Mixed_5c": 256, "Mixed_5d": 288,
                "Mixed_6a": 288,
                "Mixed_6b": 768, "Mixed_6c": 768, "Mixed_6d": 768,
                "Mixed_6e": 768, "Mixed_7a": 768,
                "Mixed_7b": 1280, "Mixed_7c": 2048}
    out_ch = {name: o for name, o, *_ in CONV_TABLE}
    for name, _, _, _, _, _ in CONV_TABLE:
        if "." not in name:
            continue
        blk, branch = name.split(".", 1)
        cin = block_in[blk]
        # chained branches read the previous conv in their chain
        chains = {
            "branch5x5_2": "branch5x5_1",
            "branch3x3dbl_2": "branch3x3dbl_1",
            "branch3x3dbl_3": "branch3x3dbl_2",
            "branch7x7_2": "branch7x7_1", "branch7x7_3": "branch7x7_2",
            "branch7x7dbl_2": "branch7x7dbl_1",
            "branch7x7dbl_3": "branch7x7dbl_2",
            "branch7x7dbl_4": "branch7x7dbl_3",
            "branch7x7dbl_5": "branch7x7dbl_4",
            "branch3x3_2": "branch3x3_1",
            "branch7x7x3_2": "branch7x7x3_1",
            "branch7x7x3_3": "branch7x7x3_2",
            "branch7x7x3_4": "branch7x7x3_3",
            "branch3x3_2a": "branch3x3_1", "branch3x3_2b": "branch3x3_1",
            "branch3x3dbl_3a": "branch3x3dbl_2",
            "branch3x3dbl_3b": "branch3x3dbl_2",
        }
        if branch in chains:
            ins[name] = out_ch[f"{blk}.{chains[branch]}"]
        else:
            ins[name] = cin
    return ins


def init_random_inception(seed: int = 0) -> Dict[str, jax.Array]:
    """Fixed random weights with the exact production shapes (offline
    testing / deterministic two-sample discrepancy)."""
    rng = np.random.RandomState(seed)
    ins = conv_input_channels()
    params = {}
    for name, out, kh, kw, _, _ in CONV_TABLE:
        fan_in = ins[name] * kh * kw
        params[name + ".w"] = jnp.asarray(
            rng.randn(kh, kw, ins[name], out).astype(np.float32)
            / np.sqrt(fan_in))
        params[name + ".b"] = jnp.zeros((out,), jnp.float32)
    return params


def load_inception_npz(path: str) -> Dict[str, jax.Array]:
    """Load a BN-folded npz (utils.export_weights.export_inception_npz)."""
    data = np.load(path)
    ins = conv_input_channels()
    params = {}
    for name, out, kh, kw, _, _ in CONV_TABLE:
        w = data[name + ".w"]
        assert w.shape == (kh, kw, ins[name], out), (name, w.shape)
        params[name + ".w"] = jnp.asarray(w)
        params[name + ".b"] = jnp.asarray(data[name + ".b"])
    return params


def _conv(p, name, x, stride, pad):
    w = p[name + ".w"]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        ((pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + p[name + ".b"].astype(y.dtype))


_SPECS = {name: (s, pd) for name, _, _, _, s, pd in CONV_TABLE}


def _c2(p, name, x):
    return _conv(p, name, x, *_SPECS[name])


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID")


def _avgpool3(x):
    # 3x3 stride-1 avg pool, count_include_pad=True (torchvision default)
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / 9.0


def _block_a(p, n, x):
    b1 = _c2(p, f"{n}.branch1x1", x)
    b5 = _c2(p, f"{n}.branch5x5_2", _c2(p, f"{n}.branch5x5_1", x))
    b3 = _c2(p, f"{n}.branch3x3dbl_3",
             _c2(p, f"{n}.branch3x3dbl_2", _c2(p, f"{n}.branch3x3dbl_1", x)))
    bp = _c2(p, f"{n}.branch_pool", _avgpool3(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(p, n, x):
    b3 = _c2(p, f"{n}.branch3x3", x)
    bd = _c2(p, f"{n}.branch3x3dbl_3",
             _c2(p, f"{n}.branch3x3dbl_2", _c2(p, f"{n}.branch3x3dbl_1", x)))
    return jnp.concatenate([b3, bd, _maxpool(x)], axis=-1)


def _block_c(p, n, x):
    b1 = _c2(p, f"{n}.branch1x1", x)
    b7 = _c2(p, f"{n}.branch7x7_3",
             _c2(p, f"{n}.branch7x7_2", _c2(p, f"{n}.branch7x7_1", x)))
    bd = x
    for i in (1, 2, 3, 4, 5):
        bd = _c2(p, f"{n}.branch7x7dbl_{i}", bd)
    bp = _c2(p, f"{n}.branch_pool", _avgpool3(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(p, n, x):
    b3 = _c2(p, f"{n}.branch3x3_2", _c2(p, f"{n}.branch3x3_1", x))
    b7 = x
    for i in (1, 2, 3, 4):
        b7 = _c2(p, f"{n}.branch7x7x3_{i}", b7)
    return jnp.concatenate([b3, b7, _maxpool(x)], axis=-1)


def _block_e(p, n, x):
    b1 = _c2(p, f"{n}.branch1x1", x)
    b3 = _c2(p, f"{n}.branch3x3_1", x)
    b3 = jnp.concatenate(
        [_c2(p, f"{n}.branch3x3_2a", b3), _c2(p, f"{n}.branch3x3_2b", b3)], -1)
    bd = _c2(p, f"{n}.branch3x3dbl_2", _c2(p, f"{n}.branch3x3dbl_1", x))
    bd = jnp.concatenate(
        [_c2(p, f"{n}.branch3x3dbl_3a", bd), _c2(p, f"{n}.branch3x3dbl_3b", bd)], -1)
    bp = _c2(p, f"{n}.branch_pool", _avgpool3(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


@functools.partial(jax.jit, static_argnames=("resize",))
def inception_pool3(params: Dict, images: jax.Array, resize: bool = True) -> jax.Array:
    """images (N, H, W, 3) in [-1, 1] -> (N, 2048) pool3 features.

    Matches the published-FID preprocessing: bilinear resize to 299x299 of
    the [-1, 1] image (pytorch-fid resizes then scales; bilinear commutes
    with the affine scaling).
    """
    x = images.astype(jnp.float32)
    if resize:
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
    for n in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3"):
        x = _c2(params, n, x)
    x = _maxpool(x)
    x = _c2(params, "Conv2d_3b_1x1", x)
    x = _c2(params, "Conv2d_4a_3x3", x)
    x = _maxpool(x)
    for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _block_a(params, n, x)
    x = _block_b(params, "Mixed_6a", x)
    for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _block_c(params, n, x)
    x = _block_d(params, "Mixed_7a", x)
    x = _block_e(params, "Mixed_7b", x)
    x = _block_e(params, "Mixed_7c", x)
    return jnp.mean(x, axis=(1, 2))  # global average pool -> (N, 2048)
