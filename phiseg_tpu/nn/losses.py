"""Loss library.

TPU-native equivalent of `tfwrapper/losses.py` (get_dice :8-47, dice_loss
:50-119, cross_entropy_loss :123-131, pixel_wise_cross_entropy_loss_weighted
:135-159) plus the PHiSeg model losses from `phiseg/phiseg_model.py`
(KL_two_gauss_with_diag_cov :210-226, multinoulli_loss_with_logits :229-238).

All functions are pure jnp and jit/vmap/grad-friendly. Logits / probabilities
are NHWC with the class axis last; label maps are integer NHW.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def one_hot(labels: jax.Array, nlabels: int, dtype=jnp.float32) -> jax.Array:
    """Integer label map -> one-hot with class axis last (ref phiseg_model.py:29)."""
    return jax.nn.one_hot(labels, nlabels, dtype=dtype)


def softmax_xent_with_logits(labels_oh: jax.Array, logits: jax.Array) -> jax.Array:
    """Per-element softmax cross-entropy; class axis last. Returns shape without class axis.

    Equivalent of `tf.nn.softmax_cross_entropy_with_logits_v2`.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.sum(labels_oh * logp, axis=-1)


def multinoulli_loss_with_logits(labels_oh: jax.Array, logits: jax.Array) -> jax.Array:
    """Pixel-summed, batch-meaned softmax CE (ref phiseg_model.py:229-238).

    labels_oh, logits: (B, H, W, C). Returns a scalar: mean over batch of the
    per-image sum over pixels of the per-pixel cross-entropy.
    """
    xent = softmax_xent_with_logits(labels_oh, logits)  # (B, H, W)
    return jnp.mean(jnp.sum(xent.reshape(xent.shape[0], -1), axis=1))


def kl_two_gauss_diag_cov(
    mu0: jax.Array, sigma0: jax.Array, mu1: jax.Array, sigma1: jax.Array
) -> jax.Array:
    """KL(N(mu0, sigma0^2) || N(mu1, sigma1^2)) for diagonal covariance.

    Matches the reference numerics exactly (phiseg_model.py:210-226): squares
    first, +1e-10 inside the logs and the denominator, sum over all non-batch
    dims, mean over batch.
    """
    mu0 = mu0.astype(jnp.float32).reshape(mu0.shape[0], -1)
    mu1 = mu1.astype(jnp.float32).reshape(mu1.shape[0], -1)
    s0sq = jnp.square(sigma0.astype(jnp.float32).reshape(sigma0.shape[0], -1))
    s1sq = jnp.square(sigma1.astype(jnp.float32).reshape(sigma1.shape[0], -1))
    per_sample = 0.5 * jnp.sum(
        (s0sq + jnp.square(mu1 - mu0)) / (s1sq + 1e-10)
        + jnp.log(s1sq + 1e-10)
        - jnp.log(s0sq + 1e-10)
        - 1.0,
        axis=1,
    )
    return jnp.mean(per_sample)


# ---------------------------------------------------------------------------
# Dice losses (library parity with tfwrapper/losses.py; the shipped PHiSeg
# configs do not use them for training, but they are part of the op library).
# ---------------------------------------------------------------------------


def get_dice(logits: jax.Array, labels_oh: jax.Array, epsilon: float = 1e-10) -> jax.Array:
    """Per-(structure, batch) soft Dice from logits (ref losses.py:8-47).

    Returns (B, C) soft dice scores computed from the softmax probabilities.
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    b, c = probs.shape[0], probs.shape[-1]
    probs_f = probs.reshape(b, -1, c)
    labels_f = labels_oh.astype(jnp.float32).reshape(b, -1, c)
    intersection = jnp.sum(probs_f * labels_f, axis=1)
    size_pred = jnp.sum(probs_f, axis=1)
    size_gt = jnp.sum(labels_f, axis=1)
    return (2.0 * intersection) / (size_pred + size_gt + epsilon)


def dice_loss(
    logits: jax.Array,
    labels_oh: jax.Array,
    mode: str = "macro_robust",
    only_foreground: bool = False,
    epsilon: float = 1e-10,
) -> jax.Array:
    """Dice loss with macro / macro_robust / micro modes (ref losses.py:50-119)."""
    if mode == "micro":
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        labels_f = labels_oh.astype(jnp.float32)
        if only_foreground:
            probs = probs[..., 1:]
            labels_f = labels_f[..., 1:]
        intersection = jnp.sum(probs * labels_f)
        size = jnp.sum(probs) + jnp.sum(labels_f)
        return 1.0 - (2.0 * intersection) / (size + epsilon)

    dice_per = get_dice(logits, labels_oh, epsilon)  # (B, C)
    if only_foreground:
        dice_per = dice_per[:, 1:]
    if mode == "macro":
        return 1.0 - jnp.mean(jnp.mean(dice_per, axis=0))
    if mode == "macro_robust":
        return 1.0 - jnp.mean(jnp.mean(dice_per, axis=1))
    raise ValueError(f"unknown dice mode: {mode!r}")


def cross_entropy_loss(logits: jax.Array, labels_oh: jax.Array) -> jax.Array:
    """Mean softmax CE over all elements (ref losses.py:123-131)."""
    return jnp.mean(softmax_xent_with_logits(labels_oh, logits))


def pixel_wise_cross_entropy_loss_weighted(
    logits: jax.Array, labels_oh: jax.Array, class_weights: Sequence[float]
) -> jax.Array:
    """Class-weighted pixel-wise CE (ref losses.py:135-159)."""
    w = jnp.asarray(class_weights, dtype=jnp.float32)
    weight_map = jnp.sum(labels_oh.astype(jnp.float32) * w, axis=-1)
    xent = softmax_xent_with_logits(labels_oh, logits)
    return jnp.mean(xent * weight_map)
