"""Small data-side helpers.

Behavioural parity with reference ``lib/data/utils.py``: EasyDict (:12-25),
stdout Logger tee (:28-84), print_stats debug (:87-94), stitch_images
(:97-112).
"""

from __future__ import annotations

import os
import sys
from typing import List

import numpy as np


class EasyDict(dict):
    """Attribute access for dict keys (ref :12-25)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        del self[name]


class Logger:
    """Tee stdout to a file (ref :28-84)."""

    def __init__(self, file_name: str = "log.txt", file_mode: str = "w", should_flush: bool = True):
        self.file = open(file_name, file_mode) if file_name else None
        self.should_flush = should_flush
        self.stdout = sys.stdout
        sys.stdout = self

    def write(self, text: str) -> None:
        if len(text) == 0:
            return
        if self.file is not None:
            self.file.write(text)
        self.stdout.write(text)
        if self.should_flush:
            self.flush()

    def flush(self) -> None:
        if self.file is not None:
            self.file.flush()
        self.stdout.flush()

    def close(self) -> None:
        self.flush()
        if sys.stdout is self:
            sys.stdout = self.stdout
        if self.file is not None:
            self.file.close()
            self.file = None


def print_stats(x, name: str = "", scientific: bool = False) -> str:
    """min/mean/max/std one-liner (ref :87-94)."""
    x = np.asarray(x, np.float64)
    fmt = "{:.3e}" if scientific else "{:.3f}"
    msg = f"{name}: min={fmt} mean={fmt} max={fmt} std={fmt}".format(
        x.min(), x.mean(), x.max(), x.std())
    print(msg)
    return msg


def stitch_images(images: List[np.ndarray], axis: int = 1) -> np.ndarray:
    """Concatenate same-height images side by side (ref :97-112)."""
    return np.concatenate(list(images), axis=axis)


def make_grid(images: np.ndarray, nrow: int = 8, pad: int = 2, pad_value: float = 0.0) -> np.ndarray:
    """NHWC batch -> one HWC grid image (torchvision.make_grid stand-in for
    the trainer's sample dumps)."""
    n, h, w, c = images.shape
    ncol = nrow
    nr = -(-n // ncol)
    canvas = np.full(
        (nr * (h + pad) + pad, ncol * (w + pad) + pad, c), pad_value, images.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        y0 = pad + r * (h + pad)
        x0 = pad + col * (w + pad)
        canvas[y0 : y0 + h, x0 : x0 + w] = images[i]
    return canvas


def colorize_labels(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """(N, H, W) int labels -> (N, H, W, 3) float RGB in [0, 1].

    Stand-in for the reference's TensorBoard D-segmentation-map images
    (ref phase_trainer.py log_image :553-683): class 0 (fake) black,
    class 1 (background) white, body parts on an HSV wheel.
    """
    labels = np.asarray(labels).astype(np.int64)
    palette = np.zeros((max(num_classes, 2), 3), np.float32)
    palette[1] = 1.0
    n_parts = max(num_classes - 2, 1)
    for i in range(2, num_classes):
        h = (i - 2) / n_parts * 6.0
        x = 1.0 - abs(h % 2.0 - 1.0)
        rgb = [(1, x, 0), (x, 1, 0), (0, 1, x),
               (0, x, 1), (x, 0, 1), (1, 0, x)][int(h) % 6]
        palette[i] = rgb
    return palette[np.clip(labels, 0, num_classes - 1)]
