"""Shared building blocks for the model zoo.

The reference builds three structurally-overlapping conv networks
(posterior / prior / likelihood, phiseg/model_zoo/*.py); here the shared
structure is factored into reusable Flax modules:

  EncoderTower    -- the R-level "pre_z" conv tower (posteriors.py:84-95,
                     priors.py:77-88, likelihoods.py encoders :30-44, :106-120)
  GaussianHead    -- (mu, softplus-sigma) conv heads (posteriors.py:105-107)
  LatentHierarchy -- the coarse-to-fine autoregressive latent chain with the
                     teacher-forcing switch (posteriors.py:98-130,
                     priors.py:91-126)
  UNetCore        -- the U-Net encoder/decoder used by the prob/det U-Net
                     likelihoods (likelihoods.py:10-79, :81-159)
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from phiseg_tpu.nn.layers import (
    ConvBlock,
    avg_pool_2x2,
    reparameterize,
    upsample_bilinear,
)

Dtype = Any


def default_channels(n0: int, resolution_levels: int) -> Tuple[int, ...]:
    """Per-level channel schedule: [n0, 2n0, 4n0, 6n0, 6n0, ...].

    Matches the reference `num_channels` (posteriors.py:59) for any number of
    resolution levels.
    """
    mults = [1, 2, 4] + [6] * max(0, resolution_levels - 3)
    return tuple(n0 * m for m in mults[:resolution_levels])


class EncoderTower(nn.Module):
    """R resolution levels of 3 conv blocks each, 2x2 avg-pool between levels.

    Returns the per-level feature list (finest first). Equivalent of the
    `pre_z` / `enc` towers in the reference (posteriors.py:84-95).
    """

    n0: int
    resolution_levels: int
    norm: str = "batch"
    dtype: Dtype = jnp.float32

    def setup(self):
        ch = default_channels(self.n0, self.resolution_levels)
        self.convs = [
            ConvBlock(ch[i], norm=self.norm, dtype=self.dtype, name=f"level{i}_conv{k}")
            for i in range(self.resolution_levels)
            for k in range(3)
        ]

    def __call__(self, x: jax.Array, *, train: bool = False) -> Tuple[jax.Array, ...]:
        feats = []
        net = x.astype(self.dtype)
        for i in range(self.resolution_levels):
            if i > 0:
                net = avg_pool_2x2(net)
            for k in range(3):
                net = self.convs[i * 3 + k](net, train=train)
            feats.append(net)
        return tuple(feats)


class GaussianHead(nn.Module):
    """(mu, sigma) conv heads; sigma through softplus (posteriors.py:105-107).

    The reference uses a 3x3 kernel for mu at the coarsest latent level and
    1x1 everywhere else (posteriors.py:105 vs :125); `mu_kernel` preserves
    that. Heads carry biases and no normalisation.
    """

    zdim: int
    mu_kernel: Tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.float32

    def setup(self):
        self.mu_conv = ConvBlock(
            self.zdim, kernel_size=self.mu_kernel, activation=None, norm="none",
            dtype=self.dtype, name="mu",
        )
        self.sigma_conv = ConvBlock(
            self.zdim, kernel_size=(1, 1), activation=nn.softplus, norm="none",
            dtype=self.dtype, name="sigma",
        )

    def __call__(self, feats: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return self.mu_conv(feats), self.sigma_conv(feats)


class LatentHierarchy(nn.Module):
    """Coarse-to-fine autoregressive latent chain over L levels.

    Re-design of the `z_ups_mat` machinery in the reference
    (posteriors.py:98-130, priors.py:91-126). The reference builds a full
    upsample matrix of which only one step per level is ever consumed (the
    rest is dead graph); here each level i < L-1 takes the level-(i+1) sample,
    bilinearly upsamples it once, refines with two convs, concatenates with
    the encoder feature at the matching resolution and predicts (mu, sigma).

    `z_chain_source` implements the training-time teacher forcing of the
    prior (priors.py:122-126): when given, the chain consumes those z's
    (the posterior's samples) instead of this module's own draws.
    """

    zdim0: int
    n0: int
    latent_levels: int
    resolution_levels: int
    norm: str = "batch"
    dtype: Dtype = jnp.float32

    def setup(self):
        L, R = self.latent_levels, self.resolution_levels
        ch = default_channels(self.n0, R)
        self.heads = [
            GaussianHead(
                self.zdim0,
                mu_kernel=(3, 3) if i == L - 1 else (1, 1),
                dtype=self.dtype,
                name=f"z{i}_head",
            )
            for i in range(L)
        ]
        # Per level i < L-1: two refinement convs on the upsampled z from
        # below (zdim0*n0 filters, posteriors.py:115-116) and two convs on
        # the concat with the encoder feature (ch[i] filters, :122-123).
        self.ups_convs = [
            [
                ConvBlock(self.zdim0 * self.n0, norm=self.norm, dtype=self.dtype,
                          name=f"z{i}_ups_conv{k}")
                for k in range(2)
            ]
            for i in range(L - 1)
        ]
        self.input_convs = [
            [
                ConvBlock(ch[i], norm=self.norm, dtype=self.dtype,
                          name=f"z{i}_input_conv{k}")
                for k in range(2)
            ]
            for i in range(L - 1)
        ]

    def __call__(
        self,
        pre_z: Sequence[jax.Array],
        rng: jax.Array,
        *,
        train: bool = False,
        z_chain_source: Optional[Sequence[jax.Array]] = None,
    ) -> Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...], Tuple[jax.Array, ...]]:
        L = self.latent_levels
        lvl_diff = self.resolution_levels - self.latent_levels

        z: List[Optional[jax.Array]] = [None] * L
        mu: List[Optional[jax.Array]] = [None] * L
        sigma: List[Optional[jax.Array]] = [None] * L

        keys = jax.random.split(rng, L)
        for i in reversed(range(L)):
            if i == L - 1:
                feats = pre_z[i + lvl_diff]
            else:
                chain_z = (
                    z_chain_source[i + 1] if z_chain_source is not None else z[i + 1]
                )
                zb = upsample_bilinear(chain_z.astype(self.dtype), 2)
                zb = self.ups_convs[i][0](zb, train=train)
                zb = self.ups_convs[i][1](zb, train=train)
                feats = jnp.concatenate([pre_z[i + lvl_diff], zb], axis=-1)
                feats = self.input_convs[i][0](feats, train=train)
                feats = self.input_convs[i][1](feats, train=train)
            mu[i], sigma[i] = self.heads[i](feats)
            z[i] = reparameterize(keys[i], mu[i], sigma[i])
        return tuple(z), tuple(mu), tuple(sigma)


class UNetCore(nn.Module):
    """U-Net encoder + decoder, returning the full-resolution feature map.

    Equivalent of the encoder/decoder pairs in the reference det/prob U-Net
    likelihoods (likelihoods.py:28-71, :104-145): bilinear x2 upsampling,
    skip concatenation with the encoder feature at the matching resolution,
    three conv blocks per decoder level (channel count of the deeper level,
    a reference quirk preserved here).
    """

    n0: int
    resolution_levels: int
    norm: str = "batch"
    dtype: Dtype = jnp.float32

    def setup(self):
        R = self.resolution_levels
        ch = default_channels(self.n0, R)
        self.encoder = EncoderTower(
            n0=self.n0, resolution_levels=R, norm=self.norm, dtype=self.dtype,
            name="encoder",
        )
        self.dec_convs = [
            ConvBlock(ch[R - jj - 1], norm=self.norm, dtype=self.dtype,
                      name=f"dec{jj}_conv{k}")
            for jj in range(R - 1)
            for k in range(3)
        ]

    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        R = self.resolution_levels
        enc = self.encoder(x, train=train)
        net = enc[-1]
        for jj in range(R - 1):
            ii = R - jj - 1
            net = upsample_bilinear(net, 2)
            net = jnp.concatenate([net, enc[ii - 1]], axis=-1)
            for k in range(3):
                net = self.dec_convs[jj * 3 + k](net, train=train)
        return net
