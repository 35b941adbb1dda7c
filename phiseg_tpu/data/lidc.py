"""LIDC-IDRI data pipeline: raw pickle -> HDF5 -> batch providers.

Equivalent of the reference `data/lidc_data_loader.py` (prepare_data :46-106,
load_and_maybe_process_data :109-135) and `data/lidc_data.py` (:8-52).

The raw input is Stefan Knegt's LIDC crops pickle: a dict keyed by lesion id
with entries {'image': (128,128) float, 'masks': list of 4 (128,128) binary
masks, 'series_uid': patient id}. Preprocessing:
  * chunked 2GB-safe pickle read (ref :56-61)
  * PATIENT-level 64/16/20 train/val/test split over unique series_uids
    (ref :69-73) so no patient leaks across splits
  * images stored as float - 0.5 (ref :92), masks stacked to (128,128,4)
    uint8 (ref :94-97)
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Dict

import numpy as np

log = logging.getLogger(__name__)


def crop_or_pad_slice_to_size(sl: np.ndarray, nx: int, ny: int) -> np.ndarray:
    """Centre crop-or-zero-pad a 2D slice (ref lidc_data_loader.py:16-35)."""
    x, y = sl.shape
    out = np.zeros((nx, ny), dtype=sl.dtype)
    xs, ys = max((x - nx) // 2, 0), max((y - ny) // 2, 0)
    xc, yc = max((nx - x) // 2, 0), max((ny - y) // 2, 0)
    w, h = min(x, nx), min(y, ny)
    out[xc : xc + w, yc : yc + h] = sl[xs : xs + w, ys : ys + h]
    return out


def _stable_uid(series_uid) -> int:
    """Deterministic 63-bit patient id from a series_uid string."""
    import hashlib

    digest = hashlib.blake2b(str(series_uid).encode(), digest_size=8).digest()
    return int.from_bytes(digest, "big") >> 1


def _read_pickle_chunked(path: str):
    """2GB-safe pickle read (ref lidc_data_loader.py:56-61)."""
    max_bytes = 2**31 - 1
    size = os.path.getsize(path)
    buf = bytearray(0)
    with open(path, "rb") as f:
        for _ in range(0, size, max_bytes):
            buf += f.read(max_bytes)
    return pickle.loads(bytes(buf))


def prepare_data(input_file: str, output_file: str, split_seed: int = 0) -> None:
    """Raw pickle -> HDF5 with patient-level splits (ref :46-106).

    The reference used sklearn's train_test_split without a seed; here the
    split is seeded for reproducibility (documented deviation).
    """
    import h5py

    data = _read_pickle_chunked(input_file)

    series_uids = np.unique([v["series_uid"] for v in data.values()])
    rng = np.random.RandomState(split_seed)
    perm = rng.permutation(series_uids)
    n = len(perm)
    n_test = int(round(0.2 * n))
    n_val = int(round(0.2 * (n - n_test)))
    split_ids = {
        "test": set(perm[:n_test]),
        "val": set(perm[n_test : n_test + n_val]),
        "train": set(perm[n_test + n_val :]),
    }

    buckets: Dict[str, dict] = {tt: {"images": [], "labels": [], "uids": []} for tt in split_ids}
    for value in data.values():
        sid = value["series_uid"]
        tt = next(t for t, ids in split_ids.items() if sid in ids)
        buckets[tt]["images"].append(np.asarray(value["image"], dtype=np.float64) - 0.5)
        lbl = np.asarray(value["masks"]).transpose((1, 2, 0))  # (128,128,4)
        buckets[tt]["labels"].append(lbl)
        # The reference stores hash(series_uid) (ref :98). Python's str hash
        # is salted per-process, so the stable blake2 digest is used instead
        # -- uids must identify the same patient across runs (documented
        # deviation; collision-free like the reference's manual check).
        buckets[tt]["uids"].append(_stable_uid(sid))

    with h5py.File(output_file, "w") as f:
        for tt, b in buckets.items():
            grp = f.create_group(tt)
            grp.create_dataset("uids", data=np.asarray(b["uids"], dtype=np.int64))
            grp.create_dataset("labels", data=np.asarray(b["labels"], dtype=np.uint8))
            grp.create_dataset("images", data=np.asarray(b["images"], dtype=np.float64))
    log.info("wrote %s", output_file)


def load_and_maybe_process_data(input_file: str, preproc_folder: str,
                                force_overwrite: bool = False):
    """Cache-or-rebuild wrapper (ref lidc_data_loader.py:109-135)."""
    import h5py

    os.makedirs(preproc_folder, exist_ok=True)
    path = os.path.join(preproc_folder, "data_lidc.hdf5")
    if not os.path.exists(path) or force_overwrite:
        log.info("preprocessing LIDC pickle -> %s", path)
        prepare_data(input_file, path)
    else:
        log.info("loading cached %s", path)
    return h5py.File(path, "r")


class LIDCData:
    """Train/val/test batch providers over the LIDC HDF5 (ref lidc_data.py:8-52)."""

    def __init__(self, cfg, data_root: str, preproc_folder: str,
                 host_augment: bool = False, seed: int = 0):
        from phiseg_tpu.data.batch_provider import BatchProvider

        self.data = load_and_maybe_process_data(data_root, preproc_folder)
        kw = dict(
            add_dummy_dimension=True,
            num_labels_per_subject=cfg.num_labels_per_subject,
            annotator_range=cfg.annotator_range,
            resize_to=getattr(cfg, "resize_to", None),
        )
        self.train = BatchProvider(
            self.data["train"]["images"], self.data["train"]["labels"],
            np.arange(self.data["train"]["images"].shape[0]),
            do_augmentations=host_augment,
            augmentation_options=cfg.augmentation_options,
            seed=seed, **kw,
        )
        self.validation = BatchProvider(
            self.data["val"]["images"], self.data["val"]["labels"],
            np.arange(self.data["val"]["images"].shape[0]), seed=seed + 1, **kw,
        )
        self.test = BatchProvider(
            self.data["test"]["images"], self.data["test"]["labels"],
            np.arange(self.data["test"]["images"].shape[0]), seed=seed + 2, **kw,
        )
        # Raw array access for full-volume eval (ref lidc_data.py:48-52).
        self.validation.images = self.data["val"]["images"]
        self.validation.labels = self.data["val"]["labels"]
        self.test.images = self.data["test"]["images"]
        self.test.labels = self.data["test"]["labels"]
