"""High-level inference API mirroring the reference engine's methods.

One class wrapping a trained (cfg, model, state) with the full method surface
of the reference `phiseg` class (phiseg/phiseg_model.py):

  predict                       (:337-353)  argmax of mean softmax over N draws
  predict_segmentation_sample   (:356-364)  one prior draw
  predict_segmentation_sample_levels (:367-375) per-level logits of one draw
  sample_variance_map           (:378-430)  pixelwise generalised variance of
                                            the softmax samples
  crossentropy_error_map        (:433-446)  mean xent map vs a GT
  mean_variance_and_error_maps  (:449-475)
  generate_prior_samples        (:325-334)  z draws (+ params)
  generate_posterior_samples    (:484-495)
  decode_z / generate_samples_from_z (:313-322)

Everything batches over images and vmaps over samples on device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from phiseg_tpu.engine.train import make_sample_fn, make_sample_levels_fn
from phiseg_tpu.models.segvae import aggregate_levels
from phiseg_tpu.nn.losses import one_hot, softmax_xent_with_logits


class InferenceEngine:
    def __init__(self, cfg, model, state):
        self.cfg = cfg
        self.model = model
        self.variables = state.variables if hasattr(state, "variables") else state
        self._samplers = {}

    @classmethod
    def from_logdir(cls, log_dir: str, tag: str = "latest"):
        from phiseg_tpu.engine.loading import load_experiment

        cfg, model, state, _ = load_experiment(log_dir, tag)
        return cls(cfg, model, state)

    def _sampler(self, n: int, levels: bool = False):
        key = (n, levels)
        if key not in self._samplers:
            fn = make_sample_levels_fn if levels else make_sample_fn
            self._samplers[key] = fn(self.model, n)
        return self._samplers[key]

    # -- prediction ----------------------------------------------------------

    def sample_probs(self, x, rng, num_samples: int) -> jax.Array:
        """(S,B,H,W,C) softmax probabilities of prior draws."""
        return self._sampler(num_samples)(self.variables, jnp.asarray(x), rng)

    def predict(self, x, rng, num_samples: int = 50, return_softmax: bool = False):
        """argmax of the mean softmax over draws (ref :337-353)."""
        probs = self.sample_probs(x, rng, num_samples)
        mean = jnp.mean(probs, axis=0)
        pred = jnp.argmax(mean, axis=-1)
        return (pred, mean) if return_softmax else pred

    def predict_segmentation_sample(self, x, rng, return_softmax: bool = False):
        probs = self.sample_probs(x, rng, 1)[0]
        return probs if return_softmax else jnp.argmax(probs, axis=-1)

    def predict_segmentation_sample_levels(self, x, rng):
        """Per-level logits tuple of one prior draw (ref :367-375)."""
        levels = self._sampler(1, levels=True)(self.variables, jnp.asarray(x), rng)
        return tuple(l[0] for l in levels)

    # -- uncertainty maps -----------------------------------------------------

    def sample_variance_map(self, x, rng, num_samples: int = 50) -> jax.Array:
        """Pixelwise sum of per-class softmax variances over draws.

        The reference sums the EIGENVALUES of the per-pixel class covariance
        (:395-403), which equals its trace, i.e. the sum of per-class
        variances -- this computes the same quantity without the eig, summed
        over all classes rather than classes[:-1] (a constant factor of 2 for
        binary segmentation since p0 = 1 - p1)."""
        probs = self.sample_probs(x, rng, num_samples)
        return jnp.sum(jnp.var(probs, axis=0), axis=-1)  # (B,H,W)

    def crossentropy_error_map(self, x, s_gt, rng, num_samples: int = 100) -> jax.Array:
        """Mean pixel xent of draws vs a GT mask (ref :433-446)."""
        probs = self.sample_probs(x, rng, num_samples)
        gt_oh = one_hot(jnp.asarray(s_gt), self.cfg.nlabels)
        eps = 1e-8
        return -jnp.mean(
            jnp.sum(gt_oh[None] * jnp.log(probs + eps), axis=-1), axis=0
        )  # (B,H,W)

    def mean_variance_and_error_maps(self, x, s_gt, rng, num_samples: int = 100):
        """(means, vars, errs) triple (ref :449-475)."""
        probs = self.sample_probs(x, rng, num_samples)
        means = jnp.argmax(jnp.mean(probs, axis=0), axis=-1)
        vars_ = jnp.mean(jnp.std(probs, axis=0), axis=-1)
        gt_oh = one_hot(jnp.asarray(s_gt), self.cfg.nlabels)
        errs = -jnp.mean(jnp.sum(gt_oh[None] * jnp.log(probs + 1e-8), axis=-1), axis=0)
        return means, vars_, errs

    # -- latent access ---------------------------------------------------------

    def generate_prior_samples(self, x, rng, return_params: bool = False):
        z, mu, sigma = self.model.apply(self.variables, jnp.asarray(x), rng,
                                        method="prior_draw")
        return (z, mu, sigma) if return_params else z

    def generate_posterior_samples(self, x, s, rng, return_params: bool = False):
        s_oh = one_hot(jnp.asarray(s), self.cfg.nlabels)
        z, mu, sigma = self.model.apply(self.variables, jnp.asarray(x), s_oh, rng,
                                        method="posterior_draw")
        return (z, mu, sigma) if return_params else z

    def generate_samples_from_z(self, z, x, output_all_levels: bool = False):
        """Decode given latents (ref :313-322)."""
        levels = self.model.apply(self.variables, z, jnp.asarray(x), method="decode_z")
        return levels if output_all_levels else aggregate_levels(levels)
