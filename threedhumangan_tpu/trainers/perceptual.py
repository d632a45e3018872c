"""VGG16 perceptual loss.

Behavioural parity with reference ``lib/components/perceptual_loss.py``
(VGGPerceptualLoss :4-49): four VGG16 feature blocks (conv1_2, conv2_2,
conv3_3, conv4_3), inputs normalized with ImageNet statistics, per-block
smooth-L1 between generated and target features.  Only constructed when
``sum(perceptual_lambda) > 0`` (ref phase_trainer.py:51-54) — off in every
shipped config.

Weights: torchvision downloads pretrained VGG16 at runtime; this environment
has no egress, so weights load from a local npz (``VGG16_WEIGHTS_NPZ``) when
present and otherwise fall back to fixed random features (still a valid
perceptual-style loss signal — random VGG features are a known baseline —
and numerically deterministic for tests).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from threedhumangan_tpu.trainers.losses import smooth_l1

# VGG16 conv layout: (out_channels, convs_per_block); blocks end at the
# feature taps the reference slices (features[:4], [4:9], [9:16], [16:23])
_VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3)]
_TAPS = [2, 4, 7, 10]  # cumulative conv index after each reference slice

_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def init_vgg16_features(weights_path: str = "") -> List[Dict]:
    """Conv params [{w HWIO, b}] for the first 10 convs of VGG16."""
    path = weights_path or os.environ.get("VGG16_WEIGHTS_NPZ", "")
    convs = []
    if path and os.path.exists(path):
        data = np.load(path)
        i = 0
        while f"conv{i}_w" in data:
            convs.append({"w": jnp.asarray(data[f"conv{i}_w"]),
                          "b": jnp.asarray(data[f"conv{i}_b"])})
            i += 1
        return convs

    rs = np.random.RandomState(0)
    cin = 3
    idx = 0
    for cout, reps in _VGG_BLOCKS:
        for _ in range(reps):
            if idx >= _TAPS[-1]:
                break
            std = np.sqrt(2.0 / (9 * cin))
            convs.append({
                "w": jnp.asarray(std * rs.randn(3, 3, cin, cout).astype(np.float32)),
                "b": jnp.zeros((cout,), jnp.float32),
            })
            cin = cout
            idx += 1
    return convs


def vgg16_features(convs: Sequence[Dict], x: jax.Array) -> List[jax.Array]:
    """x: NHWC in [0, 1].  Returns the four tap activations."""
    x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    taps = []
    idx = 0
    block_end = {2: 0, 4: 1, 7: 2, 10: 3}
    pools_after = {2, 4, 7}
    for conv in convs:
        x = jax.lax.conv_general_dilated(
            x, conv["w"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + conv["b"]
        x = jax.nn.relu(x)
        idx += 1
        if idx in block_end:
            taps.append(x)
        if idx in pools_after:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return taps


def perceptual_loss(convs: Sequence[Dict], x: jax.Array, y: jax.Array) -> List[jax.Array]:
    """Per-block smooth-L1 feature distances (ref perceptual_loss.py:33-49).
    x, y: NHWC in [0, 1]."""
    fx = vgg16_features(convs, x)
    fy = vgg16_features(convs, jax.lax.stop_gradient(y))
    return [smooth_l1(a, b) for a, b in zip(fx, fy)]
