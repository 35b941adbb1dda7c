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


def make_multiscale_arrays(
    n: int, hw: tuple, num_annotators: int = 4, seed: int = 0
):
    """Multi-scale-ambiguity task: several lesions per image, annotator
    disagreement at BOTH the global-extent and boundary scales.

    Motivation (round-3): on the single-lesion nested-threshold task the
    global-latent ProbUNet wins GED^2 -- one global factor explains all the
    variability. This task is built so the segmentation distribution has a
    product structure over *locations*, the regime PHiSeg's spatial latent
    hierarchy (paper sec. 2; priors.py:122-126 teacher forcing) is designed
    for and a single global latent must approximate combinatorially:

      * one LARGE lesion (r ~ 12-20 px) with an irregular (angular-harmonic)
        boundary; every annotator includes it but thresholds the soft field
        at an annotator+lesion-specific level -> fine-scale boundary
        disagreement;
      * three SMALL lesions (r ~ 4-9 px) whose image contrast is drawn per
        lesion; each annotator INDEPENDENTLY decides to include each small
        lesion with probability equal to its detectability -> 2^3 discrete
        modes of global-extent disagreement, spatially independent;
      * a per-annotator global threshold bias couples all lesions weakly
        (the "strict vs generous rater" axis).

    Masks are conditionally independent across annotators given the image,
    matching the generative assumptions of both model families. Same output
    contract as make_synthetic_arrays: images (N,H,W) float ~[-0.5,0.5],
    labels (N,H,W,A) uint8.
    """
    h, w = hw
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    images = np.zeros((n, h, w), np.float32)
    labels = np.zeros((n, h, w, num_annotators), np.uint8)

    def soft_lesion(cy, cx, r, wobble):
        """Soft field ~1 inside, ->0 outside, irregular boundary."""
        dy, dx = yy - cy, xx - cx
        dist = np.sqrt(dy * dy + dx * dx) + 1e-6
        ang = np.arctan2(dy, dx)
        r_eff = r
        for k_h, (amp, ph) in enumerate(wobble, start=2):
            r_eff = r_eff * (1.0 + amp * np.sin(k_h * ang + ph))
        return np.exp(-np.maximum(dist / r_eff, 0.0) ** 2 * 1.2).astype(np.float32)

    for i in range(n):
        bg = rng.randn(h // 8 + 1, w // 8 + 1).astype(np.float32)
        bg = np.kron(bg, np.ones((8, 8), np.float32))[:h, :w]
        img = 0.08 * bg + 0.02 * rng.randn(h, w).astype(np.float32)

        # non-overlapping centers: 1 large + 3 small on a jittered 2x2 grid
        quads = rng.permutation(4)
        centers = []
        for q in quads:
            qy, qx = divmod(int(q), 2)
            centers.append((
                rng.uniform((0.15 + 0.5 * qy) * h, (0.35 + 0.5 * qy) * h),
                rng.uniform((0.15 + 0.5 * qx) * w, (0.35 + 0.5 * qx) * w),
            ))

        # large lesion: irregular boundary (2nd-4th angular harmonics)
        wob = [(rng.uniform(0.05, 0.18), rng.uniform(0, 2 * np.pi))
               for _ in range(3)]
        r_large = rng.uniform(0.09 * min(h, w), 0.16 * min(h, w))
        softs = [soft_lesion(*centers[0], r_large, wob)]
        contrasts = [rng.uniform(0.4, 0.55)]
        detect = [1.0]  # large lesion: always annotated

        for j in range(1, 4):  # small lesions
            r = rng.uniform(0.03 * min(h, w), 0.07 * min(h, w))
            softs.append(soft_lesion(*centers[j], r, []))
            c = rng.uniform(0.12, 0.5)  # contrast drives detectability
            contrasts.append(c)
            detect.append(float(np.clip((c - 0.05) / 0.45, 0.1, 0.95)))

        for soft, c in zip(softs, contrasts):
            img = img + c * soft
        images[i] = np.clip(img - img.mean(), -0.5, 0.5)

        for a in range(num_annotators):
            bias = rng.normal(0.0, 0.05)  # strict/generous rater axis
            mask = np.zeros((h, w), np.uint8)
            for j, soft in enumerate(softs):
                if rng.rand() > detect[j]:
                    continue  # annotator independently misses this lesion
                thr = np.clip(0.5 + bias + rng.normal(0.0, 0.08), 0.2, 0.8)
                mask |= (soft > thr).astype(np.uint8)
            labels[i, :, :, a] = mask

    return images, labels


def _bilerp_grid(coarse: np.ndarray, h: int, w: int) -> np.ndarray:
    """Bilinearly upsample a (G,G) grid to (h,w). Host-side data generation
    only (numpy gathers are fine here; the TPU-hot-path warp rule in
    data/augment_device.py does not apply to one-time dataset synthesis)."""
    g = coarse.shape[0]
    ys = np.linspace(0.0, g - 1.0, h)
    xs = np.linspace(0.0, g - 1.0, w)
    y0 = np.minimum(np.floor(ys).astype(np.int64), g - 2)
    x0 = np.minimum(np.floor(xs).astype(np.int64), g - 2)
    ty = (ys - y0)[:, None].astype(np.float32)
    tx = (xs - x0)[None, :].astype(np.float32)
    c00 = coarse[np.ix_(y0, x0)]
    c01 = coarse[np.ix_(y0, x0 + 1)]
    c10 = coarse[np.ix_(y0 + 1, x0)]
    c11 = coarse[np.ix_(y0 + 1, x0 + 1)]
    return (c00 * (1 - ty) * (1 - tx) + c01 * (1 - ty) * tx
            + c10 * ty * (1 - tx) + c11 * ty * tx).astype(np.float32)


def make_boundary_field_arrays(
    n: int, hw: tuple, num_annotators: int = 4, seed: int = 0
):
    """Boundary-FIELD ambiguity task: the disagreement between annotators is
    a smooth random scalar field, not a scalar.

    Motivation (round-3 negative result): on both the nested and the
    multiscale tasks the per-image annotator distribution has LOW conditional
    dimensionality (1 threshold, resp. 3 inclusion bits + ~4 thresholds), so
    a 6-dim global latent (ProbUNet, ref experiments/probunet.py zdim0=6)
    plus an image-conditioned decoder can index its support and wins GED^2.
    Here each annotator draws an independent 8x8 Gaussian grid, bilinearly
    upsampled to (H,W), and thresholds the shared soft lesion field at
    `0.5 + field(y,x)` -- i.e. the annotator-specific level set is displaced
    by a smooth random field with **64 independent dims per annotator**,
    unpredictable from the image. A 6-dim latent cannot cover that support;
    PHiSeg's per-level SPATIAL latent grids (paper sec. 2; priors.py:122-126)
    are exactly shaped for it (the 8x8 correlation length matches its coarse
    latent resolutions). This is the regime the hierarchy is for.

    Masks stay conditionally independent across annotators given the image
    (both model families' generative assumption); no empty masks. Same
    contract as make_synthetic_arrays: images (N,H,W) float ~[-0.5,0.5],
    labels (N,H,W,A) uint8.
    """
    h, w = hw
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    images = np.zeros((n, h, w), np.float32)
    labels = np.zeros((n, h, w, num_annotators), np.uint8)

    for i in range(n):
        bg = rng.randn(h // 8 + 1, w // 8 + 1).astype(np.float32)
        bg = np.kron(bg, np.ones((8, 8), np.float32))[:h, :w]
        img = 0.08 * bg + 0.02 * rng.randn(h, w).astype(np.float32)

        # one large irregular lesion, always annotated
        cy = rng.uniform(0.35 * h, 0.65 * h)
        cx = rng.uniform(0.35 * w, 0.65 * w)
        r = rng.uniform(0.14 * min(h, w), 0.22 * min(h, w))
        dy, dx = yy - cy, xx - cx
        dist = np.sqrt(dy * dy + dx * dx) + 1e-6
        ang = np.arctan2(dy, dx)
        r_eff = r
        for k_h in (2, 3):
            r_eff = r_eff * (1.0 + rng.uniform(0.04, 0.12)
                             * np.sin(k_h * ang + rng.uniform(0, 2 * np.pi)))
        soft = np.exp(-np.maximum(dist / r_eff, 0.0) ** 2 * 1.2).astype(np.float32)

        img = img + 0.5 * soft
        images[i] = np.clip(img - img.mean(), -0.5, 0.5)

        for a in range(num_annotators):
            # amp 0.18 puts data-level annotator diversity at d_yy ~= 0.25
            # (measured over 48 images at 128^2), matching the multiscale
            # task's 0.263 so GED magnitudes are comparable across tasks
            field = _bilerp_grid(
                rng.randn(8, 8).astype(np.float32) * 0.18, h, w)
            labels[i, :, :, a] = (soft > 0.5 + field).astype(np.uint8)

    return images, labels


_TASKS = {
    "nested": make_synthetic_arrays,
    "multiscale": make_multiscale_arrays,
    "bfield": make_boundary_field_arrays,
}


def get_task_generator(task: str):
    if task not in _TASKS:
        raise ValueError(f"unknown synth_task {task!r} (known: {sorted(_TASKS)})")
    return _TASKS[task]


class SyntheticData:
    """Same provider surface as LIDCData, but generated in memory.

    Split sizes and the task generator come from the config
    (synth_task/synth_n_train/synth_n_val/synth_n_test) so the config
    snapshot fully reproduces the dataset in eval CLIs; explicit kwargs
    override (used by tests).
    """

    def __init__(self, cfg, n_train: int | None = None, n_val: int | None = None,
                 n_test: int | None = None, host_augment: bool = False,
                 seed: int = 0):
        from phiseg_tpu.data.batch_provider import BatchProvider

        n_train = n_train if n_train is not None else getattr(cfg, "synth_n_train", 128)
        n_val = n_val if n_val is not None else getattr(cfg, "synth_n_val", 32)
        n_test = n_test if n_test is not None else getattr(cfg, "synth_n_test", 32)
        task = getattr(cfg, "synth_task", "nested")
        gen = get_task_generator(task)

        hw = (cfg.image_size[0], cfg.image_size[1])
        a = cfg.num_labels_per_subject
        tr_x, tr_y = gen(n_train, hw, a, seed=seed)
        va_x, va_y = gen(n_val, hw, a, seed=seed + 1)
        te_x, te_y = gen(n_test, hw, a, seed=seed + 2)

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
