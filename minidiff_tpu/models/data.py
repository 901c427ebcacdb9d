"""Datasets and batch iteration.

MNIST itself is not bundled (zero-egress environment); ``mnist_like_batches``
loads a local ``mnist.npz`` when MINIDIFF_TPU_MNIST points at one and
otherwise generates a learnable synthetic stand-in with the same shapes
(784-dim inputs, 10 classes) so the end-to-end training configs run anywhere.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md

if TYPE_CHECKING:
    from typing import Iterator, Optional, Tuple


def synthetic_classification(
    n: int,
    in_features: int,
    num_classes: int,
    seed: int = 0,
    noise: float = 0.3,
    centroid_seed: int = 42,
) -> "Tuple[np.ndarray, np.ndarray]":
    """Gaussian class-centroid data: linearly separable up to `noise`.

    Centroids are seeded independently of the samples so train/val splits
    drawn with different ``seed`` values share the same class structure.
    """
    centroids = np.random.RandomState(centroid_seed).randn(num_classes, in_features)
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, num_classes, size=n)
    x = centroids[labels] + noise * rng.randn(n, in_features)
    return x.astype(np.float64), labels.astype(np.int64)


def _load_mnist() -> "Optional[Tuple[np.ndarray, np.ndarray]]":
    path = os.environ.get("MINIDIFF_TPU_MNIST")
    if not path or not os.path.exists(path):
        return None
    with np.load(path) as data:
        x = data["x_train"].reshape(-1, 784).astype(np.float64) / 255.0
        y = data["y_train"].astype(np.int64)
    return x, y


def mnist_like_batches(
    batch_size: int = 128,
    epochs: int = 1,
    n: int = 4096,
    seed: int = 0,
) -> "Iterator[Tuple[md.Tensor, md.Tensor]]":
    """Yield (x, y) Tensor batches of MNIST shape (real file if configured)."""
    loaded = _load_mnist()
    rng = np.random.RandomState(seed)
    if loaded is not None:
        x, y = loaded
        if n < x.shape[0]:
            # honor `n` on the real file too: a seeded subsample, so the same
            # call yields the same dataset size with or without the env var
            pick = rng.choice(x.shape[0], size=n, replace=False)
            x, y = x[pick], y[pick]
    else:
        x, y = synthetic_classification(n, 784, 10, seed=seed)
    n_total = x.shape[0]
    for _ in range(epochs):
        order = rng.permutation(n_total)
        # include the trailing partial batch (dropping it silently yields
        # ZERO batches whenever batch_size > n_total)
        for start in range(0, n_total, batch_size):
            idx = order[start : start + batch_size]
            yield md.Tensor(x[idx]), md.Tensor(y[idx])
