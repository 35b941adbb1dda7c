"""Tests for batch providers, synthetic data and augmentation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phiseg_tpu.data.batch_provider import BatchProvider, canonicalise_aug_options
from phiseg_tpu.data.synthetic import SyntheticData, make_synthetic_arrays
from phiseg_tpu.data.augment_device import make_augment_fn
from phiseg_tpu.data.registry import get_dataset
from phiseg_tpu.engine.config import ExperimentConfig


def small_cfg(**kw):
    return ExperimentConfig(image_size=(32, 32, 1), **kw)


def make_provider(n=20, annotators=4, seed=0, **kw):
    rng = np.random.RandomState(seed)
    x = rng.rand(n, 8, 8).astype(np.float32)
    y = rng.randint(0, 2, (n, 8, 8, annotators)).astype(np.uint8)
    return BatchProvider(x, y, np.arange(n), num_labels_per_subject=annotators,
                         seed=seed, **kw), x, y


def test_epoch_exhaustive_sampling():
    """Every index is used exactly once before any repeats (ref batch_provider.py:43-67)."""
    bp, x, _ = make_provider(n=20)
    seen = []
    for _ in range(5):  # 5 batches x 4 = 20 = one epoch
        xb, yb = bp.next_batch(4)
        for row in xb[..., 0]:
            idx = np.where((x == row).all(axis=(1, 2)))[0]
            seen.append(int(idx[0]))
    assert sorted(seen) == list(range(20))


def test_batch_shapes_and_dtypes():
    bp, _, _ = make_provider()
    xb, yb = bp.next_batch(4)
    assert xb.shape == (4, 8, 8, 1) and xb.dtype == np.float32
    assert yb.shape == (4, 8, 8) and yb.dtype == np.int32


def test_annotator_range_restriction():
    """With annotator_range=[0], only annotator 0's masks come back
    (ref phiseg_7_5_1annot.py:42)."""
    rng = np.random.RandomState(0)
    x = rng.rand(10, 4, 4).astype(np.float32)
    y = np.zeros((10, 4, 4, 4), np.uint8)
    y[..., 0] = 1  # annotator 0 all-ones, others all-zero
    bp = BatchProvider(x, y, np.arange(10), num_labels_per_subject=4,
                       annotator_range=[0], seed=0)
    _, yb = bp.next_batch(8)
    assert (yb == 1).all()


def test_iterate_batches_covers_all():
    bp, _, _ = make_provider(n=10)
    count = sum(xb.shape[0] for xb, _ in bp.iterate_batches(3, shuffle=False))
    assert count == 10


def test_aug_key_canonicalisation():
    o = canonicalise_aug_options({"do_flip_lr": True, "do_flip_ud": False})
    assert o["do_fliplr"] is True and o["do_flipud"] is False


def test_synthetic_deterministic():
    x1, y1 = make_synthetic_arrays(4, (32, 32), 4, seed=7)
    x2, y2 = make_synthetic_arrays(4, (32, 32), 4, seed=7)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    x3, _ = make_synthetic_arrays(4, (32, 32), 4, seed=8)
    assert not np.allclose(x1, x3)


def test_synthetic_contract():
    x, y = make_synthetic_arrays(6, (32, 32), 4, seed=0)
    assert x.shape == (6, 32, 32) and x.dtype == np.float32
    assert y.shape == (6, 32, 32, 4) and y.dtype == np.uint8
    assert x.min() >= -0.5 and x.max() <= 0.5
    assert set(np.unique(y)) <= {0, 1}
    assert y.sum() > 0  # some lesions exist
    # annotators disagree somewhere (inter-rater variability)
    assert any((y[..., a] != y[..., b]).any() for a in range(4) for b in range(a + 1, 4))


def test_dataset_registry():
    cfg = small_cfg(data_identifier="synthetic")
    d = get_dataset(cfg, n_train=8, n_val=4, n_test=4)
    xb, yb = d.train.next_batch(2)
    assert xb.shape == (2, 32, 32, 1)
    assert d.validation.images.shape[0] == 4
    with pytest.raises(ValueError):
        get_dataset(small_cfg(data_identifier="bogus"))


# --- on-device augmentation ---------------------------------------------------


def test_augment_identity_when_all_off():
    fn = make_augment_fn({}, nlabels=2)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 1).astype(np.float32))
    s = jnp.asarray((np.random.RandomState(1).rand(2, 16, 16) > 0.5).astype(np.int32))
    x2, s2 = jax.jit(fn)(x, s, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(s))


def test_augment_flips_are_exact():
    """fliplr output must be exactly the image or its mirror, nothing else."""
    fn = make_augment_fn({"do_fliplr": True}, nlabels=2)
    x = jnp.asarray(np.arange(64, dtype=np.float32).reshape(1, 8, 8, 1))
    s = jnp.asarray((np.arange(64).reshape(1, 8, 8) % 2).astype(np.int32))
    flips = 0
    for i in range(20):
        x2, s2 = fn(x, s, jax.random.PRNGKey(i))
        if np.allclose(np.asarray(x2), np.asarray(x)):
            np.testing.assert_array_equal(np.asarray(s2), np.asarray(s))
        else:
            np.testing.assert_allclose(np.asarray(x2), np.asarray(x)[:, :, ::-1], atol=1e-5)
            np.testing.assert_array_equal(np.asarray(s2), np.asarray(s)[:, :, ::-1])
            flips += 1
    assert 0 < flips < 20  # ~50% flip rate


def test_augment_geometric_valid_outputs():
    opts = {"do_rotations": True, "do_scaleaug": True, "do_elasticaug": True,
            "do_fliplr": True, "do_flipud": True, "augment_every_nth": 1}
    fn = jax.jit(make_augment_fn(opts, nlabels=2))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 32, 32, 1).astype(np.float32))
    s = jnp.asarray((rng.rand(4, 32, 32) > 0.5).astype(np.int32))
    x2, s2 = fn(x, s, jax.random.PRNGKey(0))
    assert x2.shape == x.shape and s2.shape == s.shape
    assert np.isfinite(np.asarray(x2)).all()
    assert set(np.unique(np.asarray(s2))) <= {0, 1}
    # something actually changed
    assert not np.allclose(np.asarray(x2), np.asarray(x))


def test_augment_rotation_zero_degrees_is_identity():
    fn = make_augment_fn({"do_rotations": True, "rot_degrees": 0.0,
                          "augment_every_nth": 1}, nlabels=2)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 1).astype(np.float32))
    s = jnp.zeros((1, 16, 16), jnp.int32)
    x2, _ = fn(x, s, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)


def test_host_augmentation_runs():
    from phiseg_tpu.data.augment_host import augment_batch_host

    rng = np.random.RandomState(0)
    x = rng.rand(4, 32, 32).astype(np.float32)
    y = (rng.rand(4, 32, 32) > 0.5).astype(np.uint8)
    opts = {"do_rotations": True, "do_scaleaug": True, "do_elasticaug": True,
            "do_fliplr": True, "do_flipud": True, "nlabels": 2,
            "augment_every_nth": 1}
    x2, y2 = augment_batch_host(x, y, opts, rng)
    assert x2.shape == x.shape and y2.shape == y.shape
    assert set(np.unique(y2)) <= {0, 1}
    assert np.isfinite(x2).all()
    assert not np.allclose(x2, x)  # something actually transformed


def test_host_augmentation_zero_rotation_identity():
    from phiseg_tpu.data.augment_host import augment_batch_host

    rng = np.random.RandomState(0)
    x = rng.rand(2, 16, 16).astype(np.float32)
    y = (rng.rand(2, 16, 16) > 0.5).astype(np.uint8)
    x2, y2 = augment_batch_host(
        x, y, {"do_rotations": True, "rot_degrees": 0.0, "nlabels": 2,
               "augment_every_nth": 1}, rng)
    np.testing.assert_allclose(x2, x, atol=1e-5)
    np.testing.assert_array_equal(y2, y)


def test_host_augmentation_gating_off():
    """With a huge every_nth and flips off, nothing is ever transformed."""
    from phiseg_tpu.data.augment_host import augment_batch_host

    rng = np.random.RandomState(3)
    x = rng.rand(4, 16, 16).astype(np.float32)
    y = (rng.rand(4, 16, 16) > 0.5).astype(np.uint8)
    x2, y2 = augment_batch_host(
        x, y, {"do_rotations": True, "nlabels": 2,
               "augment_every_nth": 10_000_000}, rng)
    np.testing.assert_allclose(x2, x)
    np.testing.assert_array_equal(y2, y)


# --- provider resize_to / concurrency -----------------------------------------


def test_resize_to_option():
    """Provider resize_to produces exact target shapes, labels stay discrete
    (ref batch_provider.py:35,101-103)."""
    bp, _, _ = make_provider(n=10, resize_to=(16, 16))
    xb, yb = bp.next_batch(4)
    assert xb.shape == (4, 16, 16, 1)
    assert yb.shape == (4, 16, 16)
    assert set(np.unique(yb)) <= {0, 1}
    # downscale too
    bp2, _, _ = make_provider(n=10, resize_to=(4, 4))
    xb2, yb2 = bp2.next_batch(4)
    assert xb2.shape == (4, 4, 4, 1) and yb2.shape == (4, 4, 4)


def test_resize_batch_nearest_exact():
    from phiseg_tpu.data.batch_provider import resize_batch

    x = np.arange(4, dtype=np.float32).reshape(1, 2, 2, 1)
    out = resize_batch(x, (4, 4))
    assert out.shape == (1, 4, 4, 1)
    # nearest-neighbour: each source pixel becomes a 2x2 block
    assert set(np.unique(out)) == {0.0, 1.0, 2.0, 3.0}
    for v in range(4):
        assert (out == v).sum() == 4


def test_provider_concurrent_iterate_and_next_batch():
    """iterate_batches must be safe against the trainer's prefetch thread
    calling next_batch concurrently (round-1 race: in-place shuffle of
    self.indices without the lock)."""
    import threading

    bp, _, _ = make_provider(n=50)
    errors = []
    stop = threading.Event()

    def prefetch():
        try:
            while not stop.is_set():
                xb, yb = bp.next_batch(4)
                assert xb.shape[0] == 4
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    t = threading.Thread(target=prefetch)
    t.start()
    try:
        for _ in range(20):
            count = sum(xb.shape[0] for xb, _ in bp.iterate_batches(7))
            assert count == 50
    finally:
        stop.set()
        t.join()
    assert not errors
    # iteration never mutates the canonical index list
    np.testing.assert_array_equal(np.sort(bp.indices), np.arange(50))


# --- LIDC pickle -> HDF5 pipeline ----------------------------------------------


def _write_fake_lidc_pickle(path, n_patients=6, lesions_per_patient=3, hw=16):
    """Stefan-Knegt-shaped pickle: {id: {'image','masks','series_uid'}}."""
    import pickle

    rng = np.random.RandomState(0)
    data = {}
    k = 0
    for p in range(n_patients):
        for _ in range(lesions_per_patient):
            data[k] = {
                "image": rng.rand(hw, hw).astype(np.float64),
                "masks": [
                    (rng.rand(hw, hw) > 0.7).astype(np.uint8) for _ in range(4)
                ],
                "series_uid": f"1.2.840.{p:04d}",
            }
            k += 1
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return data


def test_prepare_data_pipeline(tmp_path):
    """Fake pickle -> prepare_data -> HDF5 contract (ref lidc_data_loader.py:46-106):
    group shapes, float-0.5 images, (H,W,4) uint8 masks, patient-level split."""
    import h5py

    from phiseg_tpu.data.lidc import prepare_data

    pkl = str(tmp_path / "data_lidc.pickle")
    h5 = str(tmp_path / "data_lidc.hdf5")
    raw = _write_fake_lidc_pickle(pkl)
    prepare_data(pkl, h5)

    with h5py.File(h5, "r") as f:
        total = 0
        uid_sets = {}
        for tt in ("train", "val", "test"):
            imgs = f[tt]["images"][:]
            lbls = f[tt]["labels"][:]
            uids = f[tt]["uids"][:]
            assert imgs.shape[1:] == (16, 16) and imgs.dtype == np.float64
            assert lbls.shape[1:] == (16, 16, 4) and lbls.dtype == np.uint8
            assert uids.shape[0] == imgs.shape[0]
            total += imgs.shape[0]
            uid_sets[tt] = set(int(u) for u in uids)
        assert total == len(raw)
        # patient-level no-leak: uid sets pairwise disjoint
        assert not (uid_sets["train"] & uid_sets["val"])
        assert not (uid_sets["train"] & uid_sets["test"])
        assert not (uid_sets["val"] & uid_sets["test"])
        # every patient's lesions land together: 6 patients x 3 lesions
        all_uids = sorted(u for s in uid_sets.values() for u in s)
        assert len(all_uids) == 6
        # images carry the -0.5 offset (ref :92)
        mn = min(f[tt]["images"][:].min() for tt in ("train", "val", "test"))
        mx = max(f[tt]["images"][:].max() for tt in ("train", "val", "test"))
        assert -0.5 <= mn and mx <= 0.5


def test_prepare_data_split_deterministic(tmp_path):
    """Seeded split: two runs produce identical grouping (documented
    deviation from the reference's unseeded sklearn split)."""
    import h5py

    from phiseg_tpu.data.lidc import prepare_data

    pkl = str(tmp_path / "p.pickle")
    _write_fake_lidc_pickle(pkl)
    a, b = str(tmp_path / "a.hdf5"), str(tmp_path / "b.hdf5")
    prepare_data(pkl, a)
    prepare_data(pkl, b)
    with h5py.File(a, "r") as fa, h5py.File(b, "r") as fb:
        for tt in ("train", "val", "test"):
            np.testing.assert_array_equal(fa[tt]["uids"][:], fb[tt]["uids"][:])
            np.testing.assert_array_equal(fa[tt]["images"][:], fb[tt]["images"][:])


def test_lidc_data_end_to_end(tmp_path):
    """LIDCData: cache-or-rebuild + providers with annotator pick
    (ref lidc_data.py:8-52, lidc_data_loader.py:109-135)."""
    from phiseg_tpu.data.lidc import LIDCData

    pkl = str(tmp_path / "data_lidc.pickle")
    _write_fake_lidc_pickle(pkl, n_patients=8, lesions_per_patient=2)
    cfg = small_cfg(num_labels_per_subject=4, annotator_range=(0, 1, 2, 3))
    d = LIDCData(cfg, data_root=pkl, preproc_folder=str(tmp_path / "pre"))
    xb, yb = d.train.next_batch(3)
    assert xb.shape == (3, 16, 16, 1) and xb.dtype == np.float32
    assert yb.shape == (3, 16, 16) and yb.dtype == np.int32
    # raw eval arrays exposed on val/test (ref lidc_data.py:48-52)
    assert d.test.labels.ndim == 4 and d.test.labels.shape[-1] == 4
    # second construction hits the HDF5 cache (no re-preprocess)
    import os

    h5path = str(tmp_path / "pre" / "data_lidc.hdf5")
    mtime = os.path.getmtime(h5path)
    d2 = LIDCData(cfg, data_root=pkl, preproc_folder=str(tmp_path / "pre"))
    assert os.path.getmtime(h5path) == mtime
    xb2, _ = d2.test.next_batch(2)
    assert xb2.shape == (2, 16, 16, 1)


# --- multi-scale-ambiguity synthetic task ------------------------------------


def test_multiscale_contract_and_determinism():
    from phiseg_tpu.data.synthetic import make_multiscale_arrays

    x1, y1 = make_multiscale_arrays(4, (64, 64), 4, seed=3)
    x2, y2 = make_multiscale_arrays(4, (64, 64), 4, seed=3)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    assert x1.shape == (4, 64, 64) and x1.dtype == np.float32
    assert y1.shape == (4, 64, 64, 4) and y1.dtype == np.uint8
    assert x1.min() >= -0.5 and x1.max() <= 0.5
    assert set(np.unique(y1)) <= {0, 1}


def test_multiscale_has_spatially_independent_disagreement():
    """The point of the task: annotators must disagree about WHICH regions
    are lesioned (component counts differ), not only about boundaries."""
    import scipy.ndimage as ndi

    from phiseg_tpu.data.synthetic import make_multiscale_arrays

    _, y = make_multiscale_arrays(12, (64, 64), 4, seed=0)
    comp_counts = np.array(
        [[ndi.label(y[i, :, :, a])[1] for a in range(4)] for i in range(12)]
    )
    # every annotator sees the large lesion
    assert (comp_counts >= 1).all()
    # in most images annotators disagree on the number of lesions
    disagree = (comp_counts.max(axis=1) != comp_counts.min(axis=1)).mean()
    assert disagree > 0.5, comp_counts


# --- boundary-field ambiguity synthetic task ---------------------------------


def test_bfield_contract_and_determinism():
    from phiseg_tpu.data.synthetic import make_boundary_field_arrays

    x1, y1 = make_boundary_field_arrays(4, (64, 64), 4, seed=3)
    x2, y2 = make_boundary_field_arrays(4, (64, 64), 4, seed=3)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    assert x1.shape == (4, 64, 64) and x1.dtype == np.float32
    assert y1.shape == (4, 64, 64, 4) and y1.dtype == np.uint8
    assert x1.min() >= -0.5 and x1.max() <= 0.5
    assert set(np.unique(y1)) <= {0, 1}
    # no empty masks: every annotator marks the (single, large) lesion
    assert (y1.sum(axis=(1, 2)) > 0).all()


def test_bfield_disagreement_is_boundary_localised_and_high_dim():
    """The point of the task: annotator disagreement lives in a smooth
    FIELD along the lesion boundary (high conditional dimensionality), not
    in a global size/threshold axis."""
    from phiseg_tpu.data.synthetic import make_boundary_field_arrays

    _, y = make_boundary_field_arrays(12, (64, 64), 4, seed=0)
    inter = y.all(axis=-1)   # pixels all annotators mark
    union = y.any(axis=-1)   # pixels any annotator marks
    band = union & ~inter    # disagreement band
    assert (band.sum(axis=(1, 2)) > 0).all()
    # a solid consensus core exists (~0.48 of the union at both 64^2 and
    # the production 128^2) -- disagreement is a band, not the whole lesion
    assert (inter.sum() / union.sum()) > 0.4
    # high-dim field, not a nested-threshold axis: for a scalar threshold
    # model, per-image masks would be totally ordered by inclusion (every
    # pair nested); the field makes most pairs non-nested.
    n_pairs = n_nested = 0
    for i in range(12):
        for a in range(4):
            for b in range(a + 1, 4):
                ya, yb = y[i, :, :, a].astype(bool), y[i, :, :, b].astype(bool)
                n_pairs += 1
                n_nested += int((ya >= yb).all() or (yb >= ya).all())
    assert n_nested / n_pairs < 0.2, (n_nested, n_pairs)


def test_synth_task_config_selects_generator():
    from phiseg_tpu.data.synthetic import make_multiscale_arrays

    cfg = small_cfg(data_identifier="synthetic").replace(
        synth_task="multiscale", synth_n_train=8, synth_n_val=4, synth_n_test=4
    )
    d = get_dataset(cfg)
    assert d.train.images.shape == (8, 32, 32)
    assert d.test.images.shape[0] == 4
    ex, _ = make_multiscale_arrays(8, (32, 32), 4, seed=0)
    np.testing.assert_array_equal(d.train.images, ex)
    with pytest.raises(ValueError):
        get_dataset(cfg.replace(synth_task="bogus"))


def test_synth_split_sizes_from_config():
    cfg = small_cfg(data_identifier="synthetic").replace(
        synth_n_train=10, synth_n_val=6, synth_n_test=5
    )
    d = get_dataset(cfg)
    assert d.train.images.shape[0] == 10
    assert d.validation.images.shape[0] == 6
    assert d.test.images.shape[0] == 5
    # enlarging the test split keeps the original images as a prefix
    d_big = get_dataset(cfg.replace(synth_n_test=9))
    np.testing.assert_array_equal(d_big.test.images[:5], d.test.images)
