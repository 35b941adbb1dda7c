"""Golden-value tests for the loss library and the PHiSeg objective."""

import jax
import jax.numpy as jnp
import numpy as np

from phiseg_tpu.nn import losses
from phiseg_tpu.engine.config import ExperimentConfig
from phiseg_tpu.engine.objective import (
    hierarchical_kl_loss,
    residual_multinoulli_loss,
    weight_decay_loss,
)
from phiseg_tpu.models.segvae import ModelOutputs


def _np_kl(mu0, s0, mu1, s1):
    """Independent numpy implementation of the reference KL (phiseg_model.py:210-226)."""
    s0sq, s1sq = s0**2, s1**2
    per = 0.5 * np.sum(
        (s0sq + (mu1 - mu0) ** 2) / (s1sq + 1e-10)
        + np.log(s1sq + 1e-10)
        - np.log(s0sq + 1e-10)
        - 1.0,
        axis=1,
    )
    return per.mean()


def test_kl_matches_closed_form():
    rng = np.random.RandomState(0)
    mu0 = rng.randn(4, 10).astype(np.float32)
    s0 = np.abs(rng.randn(4, 10)).astype(np.float32) + 0.1
    mu1 = rng.randn(4, 10).astype(np.float32)
    s1 = np.abs(rng.randn(4, 10)).astype(np.float32) + 0.1
    got = losses.kl_two_gauss_diag_cov(*map(jnp.asarray, (mu0, s0, mu1, s1)))
    np.testing.assert_allclose(float(got), _np_kl(mu0, s0, mu1, s1), rtol=1e-5)


def test_kl_zero_for_identical():
    mu = jnp.ones((2, 8))
    s = jnp.full((2, 8), 0.7)
    assert abs(float(losses.kl_two_gauss_diag_cov(mu, s, mu, s))) < 1e-4


def test_kl_flattens_spatial_dims():
    mu0 = jnp.zeros((2, 4, 4, 3))
    s0 = jnp.ones((2, 4, 4, 3))
    mu1 = jnp.ones((2, 4, 4, 3))
    s1 = jnp.ones((2, 4, 4, 3))
    # KL per dim = 0.5*1 = 0.5; 48 dims per sample.
    np.testing.assert_allclose(
        float(losses.kl_two_gauss_diag_cov(mu0, s0, mu1, s1)), 0.5 * 48, rtol=1e-5
    )


def test_multinoulli_loss_manual():
    # 2 pixels, 2 classes, batch 1
    logits = jnp.asarray([[[[2.0, 0.0], [0.0, 2.0]]]])  # (1,1,2,2)
    labels = jnp.asarray([[[[1.0, 0.0], [1.0, 0.0]]]])
    # pixel0: CE = log(1+e^-2); pixel1: CE = log(1+e^2)
    expected = np.log(1 + np.exp(-2.0)) + np.log(1 + np.exp(2.0))
    got = losses.multinoulli_loss_with_logits(labels, logits)
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)


def test_residual_accumulation_order():
    """Level i's target is the sum of levels >= i (ref phiseg_model.py:241-262)."""
    rng = jax.random.PRNGKey(0)
    s_list = [jax.random.normal(jax.random.fold_in(rng, i), (2, 4, 4, 2)) for i in range(3)]
    s_oh = jax.nn.one_hot(jnp.zeros((2, 4, 4), jnp.int32), 2)
    total, d = residual_multinoulli_loss(s_list, s_oh)
    # manual
    acc = s_list[2]
    exp2 = losses.multinoulli_loss_with_logits(s_oh, acc)
    acc = acc + s_list[1]
    exp1 = losses.multinoulli_loss_with_logits(s_oh, acc)
    acc = acc + s_list[0]
    exp0 = losses.multinoulli_loss_with_logits(s_oh, acc)
    np.testing.assert_allclose(float(d["residual_multinoulli_loss_lvl2"]), float(exp2), rtol=1e-5)
    np.testing.assert_allclose(float(d["residual_multinoulli_loss_lvl1"]), float(exp1), rtol=1e-5)
    np.testing.assert_allclose(float(d["residual_multinoulli_loss_lvl0"]), float(exp0), rtol=1e-5)
    np.testing.assert_allclose(float(total), float(exp0 + exp1 + exp2), rtol=1e-5)


def test_hierarchical_kl_exponential_weights():
    mu0 = [jnp.zeros((1, 2))] * 3
    s0 = [jnp.ones((1, 2))] * 3
    mu1 = [jnp.ones((1, 2))] * 3  # KL per level = 0.5*1*2dims = 1.0
    s1 = [jnp.ones((1, 2))] * 3
    out = ModelOutputs(s_out_list=(), z=(), q_mu=tuple(mu0), q_sigma=tuple(s0),
                       p_mu=tuple(mu1), p_sigma=tuple(s1))
    total, d = hierarchical_kl_loss(out, exponential_weighting=True)
    np.testing.assert_allclose(float(d["KL_divergence_loss_lvl0"]), 1.0, rtol=1e-4)
    np.testing.assert_allclose(float(d["KL_divergence_loss_lvl1"]), 4.0, rtol=1e-4)
    np.testing.assert_allclose(float(d["KL_divergence_loss_lvl2"]), 16.0, rtol=1e-4)
    np.testing.assert_allclose(float(total), 21.0, rtol=1e-4)
    total_flat, _ = hierarchical_kl_loss(out, exponential_weighting=False)
    np.testing.assert_allclose(float(total_flat), 3.0, rtol=1e-4)


def test_weight_decay_only_kernels():
    params = {
        "conv": {"kernel": jnp.full((2, 2), 2.0), "bias": jnp.full((4,), 100.0)},
        "bn": {"scale": jnp.full((4,), 100.0)},
    }
    # tf.nn.l2_loss = sum(x^2)/2 -> 4 * 4 / 2 = 8
    np.testing.assert_allclose(float(weight_decay_loss(params)), 8.0)


def test_dice_loss_perfect_prediction():
    labels = jax.nn.one_hot(jnp.asarray([[[0, 1], [1, 0]]]), 2)
    logits = labels * 100.0 - 50.0
    assert float(losses.dice_loss(logits, labels, mode="macro")) < 1e-3
    assert float(losses.dice_loss(logits, labels, mode="macro_robust")) < 1e-3
    assert float(losses.dice_loss(logits, labels, mode="micro")) < 1e-3


def test_cross_entropy_loss_uniform():
    logits = jnp.zeros((1, 2, 2, 4))
    labels = jax.nn.one_hot(jnp.zeros((1, 2, 2), jnp.int32), 4)
    np.testing.assert_allclose(float(losses.cross_entropy_loss(logits, labels)),
                               np.log(4.0), rtol=1e-5)


def test_weighted_pixel_ce():
    logits = jnp.zeros((1, 1, 2, 2))
    labels = jax.nn.one_hot(jnp.asarray([[[0, 1]]]), 2)
    got = losses.pixel_wise_cross_entropy_loss_weighted(logits, labels, [1.0, 3.0])
    np.testing.assert_allclose(float(got), np.log(2.0) * (1 + 3) / 2, rtol=1e-5)


def test_hierarchical_kl_sigma_floor():
    """kl_sigma_floor clamps near-zero sigmas inside the KL only."""
    mu = (jnp.zeros((1, 2)),)
    tiny = (jnp.full((1, 2), 1e-12),)
    one = (jnp.ones((1, 2)),)
    out = ModelOutputs(s_out_list=(), z=(), q_mu=mu, q_sigma=one,
                       p_mu=mu, p_sigma=tiny)
    unfloored, _ = hierarchical_kl_loss(out, exponential_weighting=False)
    assert float(unfloored) > 1e9  # the reference formula blows up
    floored, _ = hierarchical_kl_loss(out, exponential_weighting=False,
                                      sigma_floor=1.0)
    np.testing.assert_allclose(float(floored), 0.0, atol=1e-5)
    # floor below both sigmas: no effect
    same, _ = hierarchical_kl_loss(out, exponential_weighting=False,
                                   sigma_floor=1e-13)
    np.testing.assert_allclose(float(same), float(unfloored), rtol=1e-5)
