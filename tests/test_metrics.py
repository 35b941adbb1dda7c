"""Metric parity tests: on-device metrics vs. independent numpy implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phiseg_tpu.metrics import (
    dice_per_label,
    ged_terms,
    generalised_energy_distance,
    ncc,
    pairwise_iou_distance,
    variance_ncc_dist,
)


# --- independent numpy re-implementations of the reference formulas ---------


def np_dist(m1, m2, label_range, nlabels):
    """1 - mean IoU with the reference edge cases (utils.py:272-292)."""
    ious = []
    for lbl in label_range:
        a, b = (m1 == lbl), (m2 == lbl)
        if a.sum() == 0 and b.sum() == 0:
            ious.append(1.0)
        elif (a.sum() == 0) != (b.sum() == 0):
            ious.append(0.0)
        else:
            ious.append((a & b).sum() / (a | b).sum())
    return 1.0 - sum(ious) / nlabels


def np_ged(samples, gts, nlabels, label_range):
    n, m = samples.shape[0], gts.shape[0]
    d_sy = sum(np_dist(samples[i], gts[j], label_range, nlabels)
               for i in range(n) for j in range(m))
    d_ss = sum(np_dist(samples[i], samples[j], label_range, nlabels)
               for i in range(n) for j in range(n))
    d_yy = sum(np_dist(gts[i], gts[j], label_range, nlabels)
               for i in range(m) for j in range(m))
    return 2.0 / (n * m) * d_sy - d_ss / n**2 - d_yy / m**2


def np_ncc(a, v):
    a, v = a.flatten(), v.flatten()
    a = (a - a.mean()) / (a.std() * len(a))
    v = (v - v.mean()) / v.std()
    return np.correlate(a, v)[0]


def np_sncc(sample_arr, gt_arr):
    """utils.py:326-370."""
    eps = 1e-8
    mean_seg = sample_arr.mean(0)
    n, m = sample_arr.shape[0], gt_arr.shape[0]
    e_ss = np.mean(
        [-np.sum(mean_seg * np.log(sample_arr[i] + eps), -1) for i in range(n)], 0
    )
    nccs = []
    for j in range(m):
        e_sy = np.mean(
            [-np.sum(gt_arr[j] * np.log(sample_arr[i] + eps), -1) for i in range(n)], 0
        )
        nccs.append(np_ncc(e_ss, e_sy))
    return np.mean(nccs)


# --- tests -------------------------------------------------------------------


@pytest.fixture
def masks():
    rng = np.random.RandomState(0)
    samples = (rng.rand(6, 16, 16) > 0.6).astype(np.int32)
    gts = (rng.rand(4, 16, 16) > 0.6).astype(np.int32)
    samples[2] = 0  # an all-background sample to hit the edge cases
    gts[1] = 0
    return samples, gts


def test_ged_matches_numpy(masks):
    samples, gts = masks
    got = generalised_energy_distance(jnp.asarray(samples), jnp.asarray(gts),
                                      nlabels=1, label_range=(1,))
    want = np_ged(samples, gts, nlabels=1, label_range=(1,))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_ged_multilabel():
    rng = np.random.RandomState(1)
    samples = rng.randint(0, 3, (5, 8, 8))
    gts = rng.randint(0, 3, (3, 8, 8))
    got = generalised_energy_distance(jnp.asarray(samples), jnp.asarray(gts),
                                      nlabels=2, label_range=(1, 2))
    want = np_ged(samples, gts, nlabels=2, label_range=(1, 2))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_ged_identical_distributions_near_zero():
    rng = np.random.RandomState(2)
    masks = (rng.rand(8, 8, 8) > 0.5).astype(np.int32)
    got = generalised_energy_distance(jnp.asarray(masks), jnp.asarray(masks),
                                      nlabels=1, label_range=(1,))
    # identical sample sets: 2E[d_sy] = E[d_ss] + E[d_yy] -> GED^2 = 0
    np.testing.assert_allclose(float(got), 0.0, atol=1e-5)


def test_ged_terms_recompose(masks):
    samples, gts = masks
    d_sy, d_ss, d_yy = ged_terms(jnp.asarray(samples), jnp.asarray(gts),
                                 nlabels=1, label_range=(1,))
    ged = generalised_energy_distance(jnp.asarray(samples), jnp.asarray(gts),
                                      nlabels=1, label_range=(1,))
    np.testing.assert_allclose(
        2 * float(d_sy) - float(d_ss) - float(d_yy), float(ged), rtol=1e-5)
    # each term matches the numpy pair loops
    n, m = samples.shape[0], gts.shape[0]
    want_sy = sum(np_dist(samples[i], gts[j], (1,), 1)
                  for i in range(n) for j in range(m)) / (n * m)
    want_ss = sum(np_dist(samples[i], samples[j], (1,), 1)
                  for i in range(n) for j in range(n)) / n**2
    np.testing.assert_allclose(float(d_sy), want_sy, rtol=1e-5)
    np.testing.assert_allclose(float(d_ss), want_ss, rtol=1e-5)


def test_pairwise_iou_edge_cases():
    a = jnp.asarray([[[1, 1], [0, 0]], [[0, 0], [0, 0]]], jnp.int32)
    b = jnp.asarray([[[0, 0], [0, 0]]], jnp.int32)
    d = pairwise_iou_distance(a, b, label_range=(1,))
    # a[0] nonempty vs b empty -> IoU 0 -> dist 1; a[1] empty vs b empty -> IoU 1 -> dist 0
    np.testing.assert_allclose(np.asarray(d)[:, 0], [1.0, 0.0])


def test_ncc_matches_numpy():
    rng = np.random.RandomState(3)
    a, v = rng.rand(8, 8), rng.rand(8, 8)
    np.testing.assert_allclose(float(ncc(jnp.asarray(a), jnp.asarray(v))),
                               np_ncc(a, v), rtol=1e-4)


def test_ncc_self_correlation_is_one():
    a = np.random.RandomState(4).rand(16, 16)
    np.testing.assert_allclose(float(ncc(jnp.asarray(a), jnp.asarray(a))), 1.0, rtol=1e-5)


def test_sncc_matches_numpy():
    rng = np.random.RandomState(5)
    logits = rng.randn(6, 8, 8, 2).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    gts = np.eye(2, dtype=np.float32)[(rng.rand(3, 8, 8) > 0.5).astype(int)]
    got = variance_ncc_dist(jnp.asarray(probs), jnp.asarray(gts))
    np.testing.assert_allclose(float(got), np_sncc(probs, gts), rtol=1e-4)


def test_dice_edge_cases():
    pred = jnp.asarray([[0, 0], [0, 0]], jnp.int32)
    gt = jnp.asarray([[0, 0], [0, 0]], jnp.int32)
    d = dice_per_label(pred, gt, 2)
    np.testing.assert_allclose(np.asarray(d), [1.0, 1.0])  # both empty fg -> 1

    gt2 = jnp.asarray([[1, 0], [0, 0]], jnp.int32)
    d2 = dice_per_label(pred, gt2, 2)
    assert float(d2[1]) == 0.0  # one empty -> 0


def test_dice_value():
    pred = jnp.asarray([[1, 1], [0, 0]], jnp.int32)
    gt = jnp.asarray([[1, 0], [0, 0]], jnp.int32)
    d = dice_per_label(pred, gt, 2)
    np.testing.assert_allclose(float(d[1]), 2 * 1 / (2 + 1), rtol=1e-6)


def test_dice_batched():
    pred = jnp.zeros((3, 4, 4), jnp.int32)
    gt = jnp.zeros((3, 4, 4), jnp.int32)
    assert dice_per_label(pred, gt, 2).shape == (3, 2)
