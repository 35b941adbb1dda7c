"""Host-side augmentation (reference-parity path).

Mirrors the reference cv2 pipeline (data/batch_provider.py:140-271) for runs
where bit-for-bit distributional parity with the original training setup
matters. The primary TPU path is phiseg_tpu/data/augment_device.py.
"""

from __future__ import annotations

from typing import Any, Mapping, Tuple

import numpy as np

try:
    import cv2

    HAVE_CV2 = True
except Exception:  # pragma: no cover
    HAVE_CV2 = False


def _rotate(img: np.ndarray, angle: float, interp) -> np.ndarray:
    rows, cols = img.shape[:2]
    m = cv2.getRotationMatrix2D((cols / 2, rows / 2), angle, 1)
    return cv2.warpAffine(img, m, (cols, rows), flags=interp)


def _resize(img: np.ndarray, size, interp) -> np.ndarray:
    return cv2.resize(img, (size[1], size[0]), interpolation=interp)


def _to_onehot(lbl: np.ndarray, nlabels: int) -> np.ndarray:
    return np.stack([(lbl == i).astype(np.float32) for i in range(nlabels)], -1)


def augment_batch_host(
    images: np.ndarray, labels: np.ndarray, opts: Mapping[str, Any],
    rng: np.random.RandomState,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-image rotate / scale-crop / elastic / flips with every-nth gating."""
    if not HAVE_CV2:
        return images, labels

    do_rot = opts.get("do_rotations", False)
    do_scale = opts.get("do_scaleaug", False)
    do_elastic = opts.get("do_elasticaug", False)
    do_fliplr = opts.get("do_fliplr", False)
    do_flipud = opts.get("do_flipud", False)
    every_nth = int(opts.get("augment_every_nth", 2))
    nlabels = int(opts.get("nlabels", int(labels.max()) + 1))

    out_x, out_y = [], []
    for ii in range(images.shape[0]):
        img = np.squeeze(images[ii]).astype(np.float32)
        lbl = np.squeeze(labels[ii])

        if rng.randint(every_nth) == 0:
            if do_rot:
                deg = float(opts.get("rot_degrees", 10.0))
                angle = rng.uniform(-deg, deg)
                img = _rotate(img, angle, cv2.INTER_LINEAR)
                lbl = np.argmax(_rotate(_to_onehot(lbl, nlabels), angle,
                                        cv2.INTER_LINEAR), axis=-1)
            if do_scale:
                offset = int(opts.get("offset", 30))
                n_x, n_y = img.shape
                r_y = rng.randint(n_y - offset, n_y + 1)
                p_x = rng.randint(0, n_x - r_y + 1)
                p_y = rng.randint(0, n_y - r_y + 1)
                img = _resize(img[p_y:p_y + r_y, p_x:p_x + r_y], (n_x, n_y),
                              cv2.INTER_LINEAR)
                lbl = np.argmax(
                    _resize(_to_onehot(lbl[p_y:p_y + r_y, p_x:p_x + r_y], nlabels),
                            (n_x, n_y), cv2.INTER_LINEAR), axis=-1)
            if do_elastic:
                n_x, n_y = img.shape
                dx = _resize(rng.normal(0, 10, (3, 3)).astype(np.float32),
                             (n_x, n_y), cv2.INTER_CUBIC)
                dy = _resize(rng.normal(0, 10, (3, 3)).astype(np.float32),
                             (n_x, n_y), cv2.INTER_CUBIC)
                gy, gx = np.meshgrid(np.arange(n_x), np.arange(n_y), indexing="ij")
                map_x = (gx + dx).astype(np.float32)
                map_y = (gy + dy).astype(np.float32)
                img = cv2.remap(img, map_x, map_y, interpolation=cv2.INTER_LINEAR,
                                borderMode=cv2.BORDER_REFLECT)
                lbl = np.argmax(
                    cv2.remap(_to_onehot(lbl, nlabels), map_x, map_y,
                              interpolation=cv2.INTER_LINEAR,
                              borderMode=cv2.BORDER_REFLECT), axis=-1)

        if do_fliplr and rng.randint(max(2, every_nth)) == 0:
            img, lbl = np.fliplr(img), np.fliplr(lbl)
        if do_flipud and rng.randint(max(2, every_nth)) == 0:
            img, lbl = np.flipud(img), np.flipud(lbl)

        out_x.append(img)
        out_y.append(lbl)

    return np.asarray(out_x), np.asarray(out_y)
