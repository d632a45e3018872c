"""Export pretrained torch feature-extractor weights to the npz files the
TPU framework loads.

The perceptual loss (trainers/perceptual.py, ref
lib/components/perceptual_loss.py:4-49) and the FID extractor (utils/fid.py)
fall back to fixed-random weights in offline environments.  When torchvision
checkpoints ARE available (a machine with egress, or a pre-populated torch
hub cache), run:

    python -m threedhumangan_tpu.utils.export_weights vgg16 /path/vgg16.npz

and point ``VGG16_WEIGHTS_NPZ`` at the output.  Layout matches
``trainers.perceptual.init_vgg16_features``: ``conv{i}_w`` in HWIO and
``conv{i}_b`` for the first 10 convs (through conv4_3 — the reference's
``features[:23]`` taps).
"""

from __future__ import annotations

import sys

import numpy as np


def export_vgg16_npz(out_path: str, state_dict=None) -> int:
    """Convert torchvision VGG16 ``features`` weights to our npz layout.

    Args:
      out_path: destination .npz.
      state_dict: optional torch state_dict (tensor or ndarray values) with
        torchvision keys (``features.{idx}.weight``).  When None, loads
        ``torchvision.models.vgg16(weights="IMAGENET1K_V1")`` — requires the
        checkpoint in the local torch hub cache or network egress.

    Returns number of convs exported (10).
    """
    if state_dict is None:
        from torchvision.models import vgg16

        state_dict = vgg16(weights="IMAGENET1K_V1").state_dict()

    # torchvision VGG16 conv indices within `features` (convs before pool4)
    conv_feature_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21]
    out = {}
    for i, fi in enumerate(conv_feature_idx):
        w = np.asarray(state_dict[f"features.{fi}.weight"])  # OIHW
        b = np.asarray(state_dict[f"features.{fi}.bias"])
        out[f"conv{i}_w"] = w.transpose(2, 3, 1, 0).astype(np.float32)  # HWIO
        out[f"conv{i}_b"] = b.astype(np.float32)
    np.savez(out_path, **out)
    return len(conv_feature_idx)


def export_inception_npz(out_path: str, state_dict=None) -> int:
    """Convert a torchvision ``inception_v3`` state_dict to the BN-folded
    npz layout of ``utils.inception`` (point ``INCEPTION_WEIGHTS_NPZ`` at
    the output to get real Inception-pool3 FID).

    BatchNorm (eps=0.001, affine) folds into each conv at export:
      w' = w * gamma / sqrt(var + eps)   (per output channel)
      b' = beta - mean * gamma / sqrt(var + eps)
    so the JAX forward is pure conv+relu (inference extractor).

    Args:
      state_dict: mapping with torchvision keys
        (``<module>.conv.weight`` OIHW, ``<module>.bn.{weight,bias,
        running_mean,running_var}``).  When None, loads
        ``torchvision.models.inception_v3(weights="IMAGENET1K_V1")`` —
        requires the checkpoint cached locally or network egress.

    Returns the number of convs exported (94).
    """
    from threedhumangan_tpu.utils.inception import BN_EPS, CONV_TABLE

    if state_dict is None:
        from torchvision.models import inception_v3

        state_dict = inception_v3(weights="IMAGENET1K_V1").state_dict()

    out = {}
    for name, *_ in CONV_TABLE:
        w = np.asarray(state_dict[f"{name}.conv.weight"], np.float64)  # OIHW
        gamma = np.asarray(state_dict[f"{name}.bn.weight"], np.float64)
        beta = np.asarray(state_dict[f"{name}.bn.bias"], np.float64)
        mean = np.asarray(state_dict[f"{name}.bn.running_mean"], np.float64)
        var = np.asarray(state_dict[f"{name}.bn.running_var"], np.float64)
        scale = gamma / np.sqrt(var + BN_EPS)
        w = w * scale[:, None, None, None]
        b = beta - mean * scale
        out[name + ".w"] = w.transpose(2, 3, 1, 0).astype(np.float32)  # HWIO
        out[name + ".b"] = b.astype(np.float32)
    np.savez(out_path, **out)
    return len(CONV_TABLE)


def main(argv):
    if len(argv) != 3 or argv[1] not in ("vgg16", "inception"):
        print(__doc__)
        return 1
    if argv[1] == "vgg16":
        n = export_vgg16_npz(argv[2])
    else:
        n = export_inception_npz(argv[2])
    print(f"exported {n} convs to {argv[2]}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
