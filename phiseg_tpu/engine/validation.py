"""Jitted validation: N-sample draws + on-device Dice / GED^2 / S_NCC.

Equivalent of the reference validation pass (phiseg/phiseg_model.py:530-701),
which looped 100 images x 16 tiled samples through sess.run and computed
GED/NCC in Python on the host (the self-logged bottleneck, :636). Here the
whole thing is one jitted program per image-batch: vmapped sampling (encoder
runs once per image), argmax, and vectorised pairwise-IoU metrics on device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from phiseg_tpu.engine.config import ExperimentConfig
from phiseg_tpu.engine.objective import phiseg_objective
from phiseg_tpu.metrics import (
    dice_per_label,
    ged_terms,
    generalised_energy_distance,
    variance_ncc_dist,
)
from phiseg_tpu.models.segvae import SegVAE, aggregate_levels
from phiseg_tpu.nn.losses import one_hot


def pad_to_batch(arr, batch: int):
    """Pad the leading axis to `batch` by repeating the last element.

    Keeps every eval batch the same shape so the jitted validation program
    compiles exactly once (a remainder batch would force a second multi-
    minute TPU compile); callers slice the results back to the real count.
    """
    import numpy as np

    n = arr.shape[0]
    if n == batch:
        return arr
    reps = np.concatenate([np.arange(n), np.full(batch - n, n - 1)])
    return arr[reps]


def make_quant_eval_fn(model: SegVAE, cfg: ExperimentConfig, num_samples: int,
                       mesh=None):
    """Jitted fn(variables, x, s_annotators, rng) ->
    (ged (B,), sncc (B,), ged_terms (B, 3)).

    The quantitative-eval workload (ref phiseg_test_quantitative.py:39-66)
    without the Dice/ELBO terms the validation program also computes. With a
    mesh, the SAMPLE axis is sharded across devices (each chip decodes its
    share of draws from the replicated encoder cache; GSPMD inserts the
    cross-shard collectives for the pairwise-IoU reductions).

    ged_terms are the estimator's three mean terms (d_sy, d_ss, d_yy;
    GED^2 = 2*d_sy - d_ss - d_yy) from the SAME pairwise distances the GED
    uses -- a free diagnostic separating fit from diversity calibration
    (metrics.ged_terms); the reference computes only the combined number.
    """
    nlabels = cfg.nlabels
    label_range = tuple(range(1, nlabels))
    key_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        key_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))

    @jax.jit
    def quant(variables, x, s_annotators, rng):
        cache = model.apply(variables, x, method="sample_cache")
        keys = jax.random.split(rng, num_samples)
        if key_sharding is not None:
            keys = jax.lax.with_sharding_constraint(keys, key_sharding)

        def draw(k):
            return jax.nn.softmax(
                aggregate_levels(model.apply(variables, cache, k, method="decode_sample")),
                axis=-1,
            )

        probs = jax.vmap(draw)(keys)  # (S,B,H,W,C)
        probs_b = jnp.moveaxis(probs, 0, 1)
        masks_b = jnp.argmax(probs_b, axis=-1)

        def per_image(sm, gt):
            d_sy, d_ss, d_yy = ged_terms(
                sm, gt, nlabels=nlabels - 1, label_range=label_range
            )
            return 2.0 * d_sy - d_ss - d_yy, jnp.stack([d_sy, d_ss, d_yy])

        ged_b, terms_b = jax.vmap(per_image)(masks_b, s_annotators)
        gt_oh = one_hot(s_annotators, nlabels)
        sncc_b = jax.vmap(variance_ncc_dist)(probs_b, gt_oh)
        return ged_b, sncc_b, terms_b

    return quant


def make_validation_fn(model: SegVAE, cfg: ExperimentConfig):
    """Returns jitted fn(variables, x, s_annotators, s_selected, rng) ->
    (dice (B, nlabels), ged (B,), sncc (B,), elbo scalar).

    x: (B,H,W,C) images; s_annotators: (B,M,H,W) all GT annotations;
    s_selected: (B,H,W) the randomly-chosen annotation (for Dice and the
    ELBO term, matching ref :575, :600-613).
    """
    num_samples = cfg.validation_samples
    nlabels = cfg.nlabels
    label_range = tuple(range(1, nlabels))

    @jax.jit
    def validate(variables, x, s_annotators, s_selected, rng):
        # independent key streams for prior sampling and the ELBO draws
        # (one split(rng, n) each would alias when the counts match)
        rng_samples, rng_elbo = jax.random.split(rng)
        cache = model.apply(variables, x, method="sample_cache")
        keys = jax.random.split(rng_samples, num_samples)

        def draw(k):
            return jax.nn.softmax(
                aggregate_levels(model.apply(variables, cache, k, method="decode_sample")),
                axis=-1,
            )

        probs = jax.vmap(draw)(keys)  # (S,B,H,W,C)
        probs_b = jnp.moveaxis(probs, 0, 1)  # (B,S,H,W,C)
        masks_b = jnp.argmax(probs_b, axis=-1)  # (B,S,H,W)

        # mean-softmax argmax prediction (ref :587, :600)
        pred = jnp.argmax(jnp.mean(probs, axis=0), axis=-1)  # (B,H,W)
        dice_b = dice_per_label(pred, s_selected, nlabels)  # (B,nlabels)

        ged_b = jax.vmap(
            lambda sm, gt: generalised_energy_distance(
                sm, gt, nlabels=nlabels - 1, label_range=label_range
            )
        )(masks_b, s_annotators)

        gt_oh = one_hot(s_annotators, nlabels)  # (B,M,H,W,C)
        sncc_b = jax.vmap(variance_ncc_dist)(probs_b, gt_oh)

        # per-batch eval-mode ELBO. The reference tiles each image 16x and
        # evaluates loss_tot over the tiled batch (:577-585) -- i.e. the ELBO
        # estimate averages 16 posterior draws per image. Here the same
        # protocol is a vmap over 16 RNG keys (validation_elbo_samples).
        s_oh = one_hot(s_selected, nlabels)

        def elbo_draw(k):
            outputs = model.apply(variables, x, s_oh, k, train=False)
            e, _ = phiseg_objective(outputs, s_oh, cfg, params=variables["params"])
            return e

        elbo_keys = jax.random.split(rng_elbo, cfg.validation_elbo_samples)
        elbo = jnp.mean(jax.vmap(elbo_draw)(elbo_keys))

        return dice_b, ged_b, sncc_b, elbo

    return validate
