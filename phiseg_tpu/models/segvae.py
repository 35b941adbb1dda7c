"""SegVAE: the combined segmentation-VAE model driving all three families.

Re-design of the reference model engine's graph assembly
(phiseg/phiseg_model.py:20-157). The TF1 code instantiated five
shared-variable networks (posterior, prior x2, likelihood x2); here a single
Flax module exposes multiple methods over one parameter tree:

  __call__       -> the training forward (posterior sample, teacher-forced
                    prior, likelihood on posterior z's)  [ref :37-98]
  sample_cache   -> all x-dependent computation for inference sampling
  decode_sample  -> one prior draw decoded to per-level logits; vmap this
                    over split keys for N-sample inference (the reference
                    tiled the batch / looped sess.run instead,
                    phiseg_model.py:337-353, :577-585)
  posterior_draw -> posterior z samples (ref generate_posterior_samples :484)
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from phiseg_tpu.models.families import (
    DetUNetLikelihood,
    PhiSegLikelihood,
    PhiSegPosterior,
    PhiSegPrior,
    ProbUNetLikelihood,
    ProbUNetPosterior,
    ProbUNetPrior,
)

Dtype = Any
ZTuple = Tuple[jax.Array, ...]

FAMILIES = ("phiseg", "prob_unet", "det_unet")


@struct.dataclass
class ModelOutputs:
    """Training-forward outputs (one structure instead of five TF fetches)."""

    s_out_list: ZTuple  # per-level logits from the likelihood on posterior z
    z: ZTuple           # posterior samples
    q_mu: ZTuple
    q_sigma: ZTuple
    p_mu: ZTuple        # teacher-forced prior params (for the KL, ref :48-59)
    p_sigma: ZTuple


def aggregate_levels(s_list) -> jax.Array:
    """Sum per-level logits into the final output (ref phiseg_model.py:304-311)."""
    total = s_list[-1]
    for s in s_list[:-1]:
        total = total + s
    return total


class SegVAE(nn.Module):
    """One model, three families, multiple methods over shared parameters."""

    model_family: str = "phiseg"
    zdim0: int = 2
    n0: int = 32
    latent_levels: int = 5
    resolution_levels: int = 7
    nlabels: int = 2
    image_size: Tuple[int, int] = (128, 128)
    norm: str = "batch"
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.model_family not in FAMILIES:
            raise ValueError(f"unknown model family: {self.model_family!r}")
        min_side = min(self.image_size)
        if min_side < 2 ** (self.resolution_levels - 1):
            raise ValueError(
                f"image_size {self.image_size} too small for "
                f"resolution_levels={self.resolution_levels}: needs at least "
                f"{2 ** (self.resolution_levels - 1)} px per side so every "
                "encoder level halves the resolution."
            )
        common = dict(n0=self.n0, resolution_levels=self.resolution_levels,
                      norm=self.norm, dtype=self.dtype)
        if self.model_family == "phiseg":
            lat = dict(zdim0=self.zdim0, latent_levels=self.latent_levels, **common)
            self.posterior = PhiSegPosterior(**lat, name="posterior")
            self.prior = PhiSegPrior(**lat, name="prior")
            self.likelihood = PhiSegLikelihood(
                latent_levels=self.latent_levels, nlabels=self.nlabels,
                image_size=self.image_size, **common, name="likelihood",
            )
        elif self.model_family == "prob_unet":
            lat = dict(zdim0=self.zdim0, latent_levels=1, **common)
            self.posterior = ProbUNetPosterior(**lat, name="posterior")
            self.prior = ProbUNetPrior(**lat, name="prior")
            self.likelihood = ProbUNetLikelihood(
                nlabels=self.nlabels, image_size=self.image_size, **common,
                name="likelihood",
            )
        else:  # det_unet: no latents (dummy posterior/prior, ref posteriors.py:135)
            self.likelihood = DetUNetLikelihood(
                nlabels=self.nlabels, image_size=self.image_size, **common,
                name="likelihood",
            )

    @property
    def has_latents(self) -> bool:
        return self.model_family != "det_unet"

    # -- training forward ---------------------------------------------------

    def __call__(
        self, x: jax.Array, s_oh: jax.Array, rng: jax.Array, *, train: bool = False
    ) -> ModelOutputs:
        if not self.has_latents:
            s_out = self.likelihood(None, x, train=train)
            empty: ZTuple = ()
            return ModelOutputs(s_out_list=s_out, z=empty, q_mu=empty,
                                q_sigma=empty, p_mu=empty, p_sigma=empty)

        rng_q, rng_p = jax.random.split(rng)
        z, q_mu, q_sigma = self.posterior(x, s_oh, rng_q, train=train)
        # Teacher-forced prior: its autoregressive chain consumes the
        # POSTERIOR's samples (ref priors.py:126, phiseg_model.py:48-59); its
        # own draws are unused in training and DCE'd by XLA.
        _, p_mu, p_sigma = self.prior(x, rng_p, z_teacher=z, train=train)
        s_out = self.likelihood(z, x, train=train)
        return ModelOutputs(s_out_list=s_out, z=z, q_mu=q_mu, q_sigma=q_sigma,
                            p_mu=p_mu, p_sigma=p_sigma)

    # -- inference sampling (encode once, draw many) ------------------------

    def sample_cache(self, x: jax.Array):
        """All x-dependent computation needed for prior sampling, run once."""
        if not self.has_latents:
            return self.likelihood.features(x, train=False)
        prior_cache = self.prior.encode(x, train=False)
        lik_cache = self.likelihood.features(x, train=False)
        return (prior_cache, lik_cache)

    def decode_sample(self, cache, rng: jax.Array) -> ZTuple:
        """One prior draw -> per-level logits. vmap over keys for N samples."""
        if not self.has_latents:
            return self.likelihood.from_features(cache)
        prior_cache, lik_cache = cache
        z, _, _ = self.prior.heads(prior_cache, rng, train=False)
        return self.likelihood.from_features(lik_cache, z)

    def sample_logits(self, x: jax.Array, rng: jax.Array) -> jax.Array:
        """Single-sample aggregated logits (ref s_out_eval, phiseg_model.py:107)."""
        return aggregate_levels(self.decode_sample(self.sample_cache(x), rng))

    # -- auxiliary APIs mirrored from the reference engine -------------------

    def prior_draw(self, x: jax.Array, rng: jax.Array):
        """Prior z samples + params (ref generate_prior_samples :325-334)."""
        if not self.has_latents:
            return (), (), ()
        return self.prior(x, rng, train=False)

    def posterior_draw(self, x: jax.Array, s_oh: jax.Array, rng: jax.Array):
        """Posterior z samples + params (ref generate_posterior_samples :484-495)."""
        if not self.has_latents:
            return (), (), ()
        return self.posterior(x, s_oh, rng, train=False)

    def decode_z(self, z: ZTuple, x: jax.Array) -> ZTuple:
        """Decode given latents (ref generate_samples_from_z :313-322)."""
        return self.likelihood(z, x, train=False)
