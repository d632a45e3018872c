"""Frechet distance evaluation utilities.

The reference installs ``clean-fid`` but never invokes it
(doc/INSTALL.md:14, SURVEY.md §6); FID parity is nonetheless the headline
quality metric (BASELINE.md).  This module provides:

  * ``frechet_distance(mu1, sigma1, mu2, sigma2)`` — the exact FID formula,
    including the matrix square root via eigendecomposition of the
    symmetrized product (no scipy dependency);
  * ``compute_statistics(features)`` — mean/covariance of a feature batch;
  * ``extract_features(images, ...)`` — a pluggable extractor.  Standard FID
    uses InceptionV3-pool3 weights, which cannot be downloaded in an
    offline environment; when ``INCEPTION_WEIGHTS_NPZ`` is absent this falls
    back to the VGG16 feature stack from trainers.perceptual (random but
    FIXED weights — still a valid two-sample discrepancy, deterministic and
    comparable across runs of THIS framework, but not comparable to
    published Inception-FID numbers; the distinction is printed loudly).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def compute_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """features: (N, D) -> (mu (D,), sigma (D, D))."""
    feats = np.asarray(features, np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(sigma)


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Matrix square root of a (near-)PSD symmetric matrix."""
    vals, vecs = np.linalg.eigh((mat + mat.T) / 2.0)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """FID between two Gaussians: |mu1-mu2|^2 + Tr(s1 + s2 - 2 sqrt(s1 s2)).

    sqrt(s1 s2) computed as s1^{1/2} (s1^{1/2} s2 s1^{1/2})^{1/2} s1^{-1/2}
    trace-equivalently: Tr sqrt(s1 s2) = Tr sqrt(s1^{1/2} s2 s1^{1/2}).
    """
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    sigma1 = np.asarray(sigma1, np.float64)
    sigma2 = np.asarray(sigma2, np.float64)
    diff = mu1 - mu2
    s1_half = _sqrtm_psd(sigma1)
    inner = _sqrtm_psd(s1_half @ sigma2 @ s1_half)
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * np.trace(inner))


def get_extractor(kind: str = "auto"):
    """Resolve the feature extractor.

    ``kind``: 'inception' (requires ``INCEPTION_WEIGHTS_NPZ``),
    'inception-random' (fixed random weights — deterministic two-sample
    discrepancy, NOT comparable to published FID), 'vgg' (VGG16, real if
    ``VGG16_WEIGHTS_NPZ`` set else fixed-random), or 'auto' (inception if
    its npz is present, else vgg fallback).

    Returns (feats_fn(batch (B,H,W,3) in [-1,1]) -> (B,D), label).
    """
    import os

    inception_npz = os.environ.get("INCEPTION_WEIGHTS_NPZ", "")
    if kind == "auto":
        kind = "inception" if inception_npz and os.path.exists(inception_npz) else "vgg"

    if kind in ("inception", "inception-random"):
        from threedhumangan_tpu.utils.inception import (
            inception_pool3,
            init_random_inception,
            load_inception_npz,
        )

        if kind == "inception":
            if not (inception_npz and os.path.exists(inception_npz)):
                raise FileNotFoundError(
                    "kind='inception' needs INCEPTION_WEIGHTS_NPZ (export via "
                    "utils.export_weights.export_inception_npz)")
            params = load_inception_npz(inception_npz)
            label = "Inception-pool3 (real weights): standard FID"
        else:
            params = init_random_inception()
            label = ("Inception-pool3 topology, FIXED RANDOM weights: "
                     "NOT Inception-FID")
        return (lambda batch: inception_pool3(params, batch)), label

    from threedhumangan_tpu.trainers.perceptual import (
        init_vgg16_features,
        vgg16_features,
    )

    convs = init_vgg16_features()
    real = bool(os.environ.get("VGG16_WEIGHTS_NPZ", ""))
    label = ("VGG16 features (real weights)" if real
             else "VGG16 topology, FIXED RANDOM weights: NOT Inception-FID")

    def feats(batch):
        taps = vgg16_features(convs, batch * 0.5 + 0.5)
        return jnp.mean(taps[-1], axis=(1, 2))

    return feats, label


def extract_features(images, convs=None, batch_size: int = 16,
                     kind: str = "auto") -> np.ndarray:
    """images: (N, H, W, 3) in [-1, 1] -> pooled feature matrix (N, D).

    ``kind='auto'`` uses real Inception-pool3 when INCEPTION_WEIGHTS_NPZ is
    present (published-FID feature space) and the VGG16 stack otherwise."""
    if convs is not None:
        # explicit VGG conv stack (back-compat path used by eval_fid)
        from threedhumangan_tpu.trainers.perceptual import vgg16_features

        feats_raw = jax.jit(
            lambda batch: jnp.mean(vgg16_features(convs, batch * 0.5 + 0.5)[-1],
                                   axis=(1, 2)))
    else:
        feats_raw, _ = get_extractor(kind)
        feats_raw = jax.jit(feats_raw)

    out = []
    images = np.asarray(images)
    for i in range(0, len(images), batch_size):
        out.append(np.asarray(feats_raw(jnp.asarray(images[i : i + batch_size]))))
    return np.concatenate(out, axis=0)


def fid_between(images_a, images_b, convs=None) -> float:
    fa = extract_features(images_a, convs)
    fb = extract_features(images_b, convs)
    return frechet_distance(*compute_statistics(fa), *compute_statistics(fb))
