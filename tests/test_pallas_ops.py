"""Pallas fused-loss kernel vs. the plain-XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phiseg_tpu.engine.objective import residual_multinoulli_loss
from phiseg_tpu.nn.losses import multinoulli_loss_with_logits
from phiseg_tpu.ops import fused_residual_ce


def _case(levels=3, b=2, hw=16, c=2, seed=0, tile_p=256):
    rng = jax.random.PRNGKey(seed)
    logits = jax.random.normal(rng, (levels, b, hw, hw, c), jnp.float32) * 3.0
    s = (jax.random.uniform(jax.random.fold_in(rng, 1), (b, hw, hw)) > 0.6).astype(jnp.int32)
    s_oh = jax.nn.one_hot(s, c)
    return logits, s_oh, tile_p


def _reference_per_level(logits, s_oh):
    levels = logits.shape[0]
    out = []
    acc = None
    for i in reversed(range(levels)):
        acc = logits[i] if acc is None else acc + logits[i]
        out.append(multinoulli_loss_with_logits(s_oh, acc))
    return jnp.stack(out[::-1])


@pytest.mark.parametrize("levels,hw", [(1, 16), (3, 16), (5, 8)])
def test_fused_forward_matches_reference(levels, hw):
    logits, s_oh, tile_p = _case(levels=levels, hw=hw)
    got = fused_residual_ce(logits, s_oh, tile_p)
    want = _reference_per_level(logits, s_oh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_fused_forward_nondivisible_tile():
    """P not a multiple of TILE_P exercises the masking path."""
    logits, s_oh, _ = _case(levels=2, b=3, hw=10)  # P = 300
    got = fused_residual_ce(logits, s_oh, 256)
    want = _reference_per_level(logits, s_oh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_fused_gradient_matches_reference():
    logits, s_oh, tile_p = _case(levels=3, hw=8)

    def fused_total(lg):
        return jnp.sum(fused_residual_ce(lg, s_oh, tile_p))

    def ref_total(lg):
        return jnp.sum(_reference_per_level(lg, s_oh))

    g_fused = jax.grad(fused_total)(logits)
    g_ref = jax.grad(ref_total)(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_fused_weighted_gradient():
    """Per-level cotangents (loss weights) propagate correctly."""
    logits, s_oh, tile_p = _case(levels=3, hw=8, seed=3)
    w = jnp.asarray([1.0, 2.0, 0.5])

    g_fused = jax.grad(lambda lg: jnp.sum(w * fused_residual_ce(lg, s_oh, tile_p)))(logits)
    g_ref = jax.grad(lambda lg: jnp.sum(w * _reference_per_level(lg, s_oh)))(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_objective_use_fused_flag():
    logits, s_oh, _ = _case(levels=3, hw=8, seed=4)
    s_list = tuple(logits[i] for i in range(3))
    tot_ref, d_ref = residual_multinoulli_loss(s_list, s_oh, use_fused=False)
    tot_fused, d_fused = residual_multinoulli_loss(s_list, s_oh, use_fused=True)
    np.testing.assert_allclose(float(tot_ref), float(tot_fused), rtol=1e-5)
    for k in d_ref:
        np.testing.assert_allclose(float(d_ref[k]), float(d_fused[k]), rtol=1e-5)


def test_fused_in_jit_and_bf16_inputs():
    logits, s_oh, tile_p = _case(levels=2, hw=8, seed=5)
    logits = logits.astype(jnp.bfloat16)

    @jax.jit
    def f(lg):
        return fused_residual_ce(lg, s_oh, tile_p)

    got = f(logits)
    want = _reference_per_level(logits.astype(jnp.float32), s_oh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2)
