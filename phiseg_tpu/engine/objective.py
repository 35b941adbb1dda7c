"""The PHiSeg training objective (multi-scale ELBO).

Equivalent of the loss assembly in the reference engine
(phiseg/phiseg_model.py:113-130, :241-300):

  * residual multinoulli loss -- per-level softmax CE against the one-hot GT
    on the RESIDUALLY ACCUMULATED logits, summed over pixels and meaned over
    the batch (:229-262). Accumulation runs coarsest -> finest, so level i's
    target is sum_{j >= i} s_out[j].
  * hierarchical KL -- closed-form diagonal-Gaussian KL(q || p) per latent
    level, optionally weighted 4^i (coarsest highest) (:265-287).
  * optional L2 weight decay over conv/dense kernels (:290-300).

Loss-dict keys match the reference names so monitoring dashboards line up.
A fused Pallas implementation of the residual-CE reduction is available in
phiseg_tpu.ops.fused_residual_ce and used when enabled.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from phiseg_tpu.engine.config import ExperimentConfig
from phiseg_tpu.models.segvae import ModelOutputs
from phiseg_tpu.nn.losses import kl_two_gauss_diag_cov, multinoulli_loss_with_logits


def residual_multinoulli_loss(
    s_out_list, s_oh: jax.Array, use_fused: bool = False, mesh=None
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Sum over levels of CE(accumulated logits, GT) (ref :241-262)."""
    if use_fused:
        from phiseg_tpu.ops.fused_residual_ce import (
            fused_residual_ce,
            fused_residual_ce_dp,
        )

        stacked = jnp.stack(s_out_list, axis=0)
        if mesh is not None:
            per_level = fused_residual_ce_dp(stacked, s_oh, mesh)
        else:
            per_level = fused_residual_ce(stacked, s_oh)
        loss_dict = {
            f"residual_multinoulli_loss_lvl{i}": per_level[i]
            for i in range(len(s_out_list))
        }
        return jnp.sum(per_level), loss_dict

    latent_levels = len(s_out_list)
    loss_dict: Dict[str, jax.Array] = {}
    total = jnp.float32(0.0)
    s_accum: Optional[jax.Array] = None
    for i in reversed(range(latent_levels)):
        s_accum = s_out_list[i] if s_accum is None else s_accum + s_out_list[i]
        lvl_loss = multinoulli_loss_with_logits(s_oh, s_accum)
        loss_dict[f"residual_multinoulli_loss_lvl{i}"] = lvl_loss
        total = total + lvl_loss
    return total, loss_dict


def hierarchical_kl_loss(
    outputs: ModelOutputs, exponential_weighting: bool,
    sigma_floor: Optional[float] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Per-level KL(q || p), optionally 4^i weighted (ref :265-287).

    sigma_floor (documented deviation, default None = reference-faithful):
    clamp both sigmas to at least this value INSIDE the KL only. The
    reference formula guards division by zero with +1e-10 (phiseg_model.py:
    210-226), which still lets the loss spike to ~1e11 whenever a
    softplus-sigma unit saturates near 0 (observed at init and sporadically
    early in training). max(sigma, floor) bounds the KL without touching the
    sampling path; gradients w.r.t. a clamped unit are zero for that term,
    which is the desired "stop pushing sigma below the floor" behaviour.
    """
    latent_levels = len(outputs.q_mu)
    weights = [4.0**i if exponential_weighting else 1.0 for i in range(latent_levels)]
    loss_dict: Dict[str, jax.Array] = {}
    total = jnp.float32(0.0)
    clamp = (lambda s: jnp.maximum(s, sigma_floor)) if sigma_floor else (lambda s: s)
    for i in reversed(range(latent_levels)):
        kl = weights[i] * kl_two_gauss_diag_cov(
            outputs.q_mu[i], clamp(outputs.q_sigma[i]),
            outputs.p_mu[i], clamp(outputs.p_sigma[i]),
        )
        loss_dict[f"KL_divergence_loss_lvl{i}"] = kl
        total = total + kl
    return total, loss_dict


def weight_decay_loss(params) -> jax.Array:
    """L2 over kernels, matching tf.nn.l2_loss = sum(x^2)/2 over the
    'weight_variables' collection (ref :290-300, tfwrapper/utils.py:255)."""
    total = jnp.float32(0.0)
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if any(getattr(k, "key", None) == "kernel" for k in path):
            total = total + 0.5 * jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return total


def phiseg_objective(
    outputs: ModelOutputs,
    s_oh: jax.Array,
    cfg: ExperimentConfig,
    params=None,
    use_fused_ce: bool = False,
    mesh=None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Total loss + per-term dict (keys match ref loss_dict, :114-130)."""
    loss_dict: Dict[str, jax.Array] = {}
    total = jnp.float32(0.0)

    if cfg.residual_multinoulli_loss_weight is not None:
        ce, ce_dict = residual_multinoulli_loss(outputs.s_out_list, s_oh,
                                                use_fused_ce, mesh=mesh)
        loss_dict.update(ce_dict)
        total = total + cfg.residual_multinoulli_loss_weight * ce

    if cfg.kl_divergence_loss_weight is not None and len(outputs.q_mu) > 0:
        kl, kl_dict = hierarchical_kl_loss(
            outputs, cfg.exponential_weighting,
            sigma_floor=cfg.kl_sigma_floor,
        )
        loss_dict.update(kl_dict)
        total = total + cfg.kl_divergence_loss_weight * kl

    if cfg.weight_decay_weight is not None and params is not None:
        wd = cfg.weight_decay_weight * weight_decay_loss(params)
        loss_dict["weight_decay"] = wd
        total = total + wd

    loss_dict["total_loss"] = total
    return total, loss_dict
