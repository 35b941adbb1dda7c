"""Synthetic LIDC-shaped dataset.

No reference equivalent -- the reference has no test data strategy at all
(SURVEY.md section 4); every check needed the real 8GB LIDC file. This module
generates a deterministic in-memory dataset with the exact LIDC contract:

  images: (N, H, W) float in approx [-0.5, 0.5]  (LIDC stores float - 0.5)
  labels: (N, H, W, A) uint8 binary masks from A simulated annotators

Each image contains a random blurred elliptical "lesion" on structured noise;
annotators threshold the same underlying soft lesion at different levels, so
their masks are nested-but-different (mimicking LIDC inter-rater
variability), and with some probability an annotator marks nothing (LIDC has
empty annotations). This gives GED^2 / S_NCC something real to measure.
"""

from __future__ import annotations

import numpy as np


def make_synthetic_arrays(
    n: int, hw: tuple, num_annotators: int = 4, seed: int = 0
):
    h, w = hw
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    images = np.zeros((n, h, w), np.float32)
    labels = np.zeros((n, h, w, num_annotators), np.uint8)

    for i in range(n):
        # background: smooth low-frequency noise
        bg = rng.randn(h // 8 + 1, w // 8 + 1).astype(np.float32)
        bg = np.kron(bg, np.ones((8, 8), np.float32))[:h, :w]
        img = 0.08 * bg + 0.02 * rng.randn(h, w).astype(np.float32)

        # lesion: soft ellipse
        cy = rng.uniform(0.3 * h, 0.7 * h)
        cx = rng.uniform(0.3 * w, 0.7 * w)
        ry = rng.uniform(0.05 * h, 0.18 * h)
        rx = rng.uniform(0.05 * w, 0.18 * w)
        theta = rng.uniform(0, np.pi)
        dy, dx = yy - cy, xx - cx
        u = np.cos(theta) * dx + np.sin(theta) * dy
        v = -np.sin(theta) * dx + np.cos(theta) * dy
        dist = (u / rx) ** 2 + (v / ry) ** 2
        soft = np.exp(-dist * 1.2).astype(np.float32)  # ~1 inside, ->0 outside

        img = img + 0.5 * soft
        images[i] = np.clip(img - img.mean(), -0.5, 0.5)

        for a in range(num_annotators):
            if rng.rand() < 0.15:  # annotator sees no lesion
                continue
            thr = rng.uniform(0.35, 0.65)
            labels[i, :, :, a] = (soft > thr).astype(np.uint8)

    return images, labels


class SyntheticData:
    """Same provider surface as LIDCData, but generated in memory."""

    def __init__(self, cfg, n_train: int = 128, n_val: int = 32, n_test: int = 32,
                 host_augment: bool = False, seed: int = 0):
        from phiseg_tpu.data.batch_provider import BatchProvider

        hw = (cfg.image_size[0], cfg.image_size[1])
        a = cfg.num_labels_per_subject
        tr_x, tr_y = make_synthetic_arrays(n_train, hw, a, seed=seed)
        va_x, va_y = make_synthetic_arrays(n_val, hw, a, seed=seed + 1)
        te_x, te_y = make_synthetic_arrays(n_test, hw, a, seed=seed + 2)

        kw = dict(
            add_dummy_dimension=True,
            num_labels_per_subject=a,
            annotator_range=cfg.annotator_range,
        )
        self.train = BatchProvider(
            tr_x, tr_y, np.arange(n_train),
            do_augmentations=host_augment,
            augmentation_options=cfg.augmentation_options, seed=seed, **kw,
        )
        self.validation = BatchProvider(va_x, va_y, np.arange(n_val), seed=seed + 1, **kw)
        self.test = BatchProvider(te_x, te_y, np.arange(n_test), seed=seed + 2, **kw)
        # raw-array access (.images/.labels) comes from BatchProvider itself
