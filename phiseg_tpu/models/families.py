"""The three model families: PHiSeg, Probabilistic U-Net, deterministic U-Net.

Each family provides (posterior, prior, likelihood) modules with a common
method surface so `SegVAE` can drive them uniformly:

  posterior(x, s_oh, rng, train)         -> (z, mu, sigma) tuples
  prior.encode(x, train)                 -> cache (x-only computation)
  prior.heads(cache, rng, z_teacher, train) -> (z, mu, sigma)
  likelihood(z_list, x, train)           -> per-level logits tuple
  likelihood.features(x, train)          -> cache for fast repeated sampling
  likelihood.from_features(cache, z_list)-> per-level logits tuple

The encode/heads and features/from_features splits are the TPU-first
redesign: at inference the x-dependent towers run ONCE and only the cheap
z-dependent tail is re-run (vmapped) per sample. The TF1 reference re-ran
the full graph for every draw (phiseg/phiseg_model.py:337-353).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from phiseg_tpu.models.components import (
    EncoderTower,
    GaussianHead,
    LatentHierarchy,
    UNetCore,
    default_channels,
)
from phiseg_tpu.nn.layers import (
    ConvBlock,
    global_avg_pool,
    reparameterize,
    resize_nearest,
    upsample_bilinear,
)

Dtype = Any
ZTuple = Tuple[jax.Array, ...]


# ---------------------------------------------------------------------------
# PHiSeg family (posteriors.py:56-132, priors.py:51-128, likelihoods.py:162-223)
# ---------------------------------------------------------------------------


class PhiSegPosterior(nn.Module):
    """Hierarchical posterior q(z_{1..L} | x, s) (ref posteriors.py:56-132)."""

    zdim0: int
    n0: int
    latent_levels: int
    resolution_levels: int
    norm: str = "batch"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.tower = EncoderTower(
            n0=self.n0, resolution_levels=self.resolution_levels, norm=self.norm,
            dtype=self.dtype, name="tower",
        )
        self.hierarchy = LatentHierarchy(
            zdim0=self.zdim0, n0=self.n0, latent_levels=self.latent_levels,
            resolution_levels=self.resolution_levels, norm=self.norm,
            dtype=self.dtype, name="hierarchy",
        )

    def __call__(
        self, x: jax.Array, s_oh: jax.Array, rng: jax.Array, *, train: bool = False
    ) -> Tuple[ZTuple, ZTuple, ZTuple]:
        # Conditioning on the segmentation: concat(x, s_onehot - 0.5)
        # (ref posteriors.py:87).
        inp = jnp.concatenate([x, s_oh - 0.5], axis=-1).astype(self.dtype)
        pre_z = self.tower(inp, train=train)
        return self.hierarchy(pre_z, rng, train=train)


class PhiSegPrior(nn.Module):
    """Hierarchical prior p(z_{1..L} | x) (ref priors.py:51-128).

    During training the chain is teacher-forced with the posterior's samples
    (priors.py:126); in generation mode it consumes its own draws (:124).
    """

    zdim0: int
    n0: int
    latent_levels: int
    resolution_levels: int
    norm: str = "batch"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.tower = EncoderTower(
            n0=self.n0, resolution_levels=self.resolution_levels, norm=self.norm,
            dtype=self.dtype, name="tower",
        )
        self.hierarchy = LatentHierarchy(
            zdim0=self.zdim0, n0=self.n0, latent_levels=self.latent_levels,
            resolution_levels=self.resolution_levels, norm=self.norm,
            dtype=self.dtype, name="hierarchy",
        )

    def encode(self, x: jax.Array, *, train: bool = False) -> Tuple[jax.Array, ...]:
        return self.tower(x.astype(self.dtype), train=train)

    def heads(
        self,
        pre_z: Sequence[jax.Array],
        rng: jax.Array,
        *,
        z_teacher: Optional[Sequence[jax.Array]] = None,
        train: bool = False,
    ) -> Tuple[ZTuple, ZTuple, ZTuple]:
        return self.hierarchy(pre_z, rng, train=train, z_chain_source=z_teacher)

    def __call__(
        self,
        x: jax.Array,
        rng: jax.Array,
        *,
        z_teacher: Optional[Sequence[jax.Array]] = None,
        train: bool = False,
    ) -> Tuple[ZTuple, ZTuple, ZTuple]:
        return self.heads(self.encode(x, train=train), rng, z_teacher=z_teacher, train=train)


class PhiSegLikelihood(nn.Module):
    """Per-level residual decoder p(s | z_{1..L}) (ref likelihoods.py:162-223).

    Each latent level is decoded to full spatial resolution through
    `resolution_levels - latent_levels` upsample-conv steps, merged top-down,
    projected to per-level class logits and nearest-neighbour-resized to the
    image size; the training loss accumulates the levels residually
    (Laplacian-pyramid-style, phiseg_model.py:241-262).
    """

    n0: int
    latent_levels: int
    resolution_levels: int
    nlabels: int
    image_size: Tuple[int, int]
    norm: str = "batch"
    dtype: Dtype = jnp.float32

    def setup(self):
        L, R = self.latent_levels, self.resolution_levels
        D = R - L
        ch = default_channels(self.n0, R)
        self.post_convs = [
            [ConvBlock(ch[i], norm=self.norm, dtype=self.dtype, name=f"z{i}_post{k}")
             for k in range(2)]
            for i in range(L)
        ]
        self.preups_convs = [
            [ConvBlock(ch[i], norm=self.norm, dtype=self.dtype, name=f"z{i}_preups{k}")
             for k in range(D)]
            for i in range(L)
        ]
        # Top-down merge path (ref likelihoods.py:204-215); note the merge
        # convs use the channel count of level i + lvl_diff (a reference
        # quirk preserved for parity, likelihoods.py:212-213).
        self.ups_convs = [
            ConvBlock(ch[i], norm=self.norm, dtype=self.dtype, name=f"post_c{i}_ups")
            for i in range(L - 1)
        ]
        self.merge_convs = [
            [ConvBlock(ch[i + D], norm=self.norm, dtype=self.dtype, name=f"post_c{i}_merge{k}")
             for k in range(2)]
            for i in range(L - 1)
        ]
        self.out_convs = [
            ConvBlock(self.nlabels, kernel_size=(1, 1), activation=None, norm="none",
                      dtype=self.dtype, name=f"out{i}")
            for i in range(L)
        ]

    def __call__(
        self, z_list: Sequence[jax.Array], x: Optional[jax.Array] = None, *, train: bool = False
    ) -> Tuple[jax.Array, ...]:
        del x  # only the U-Net families condition the likelihood on x
        L = self.latent_levels
        D = self.resolution_levels - self.latent_levels

        post_z = []
        for i in range(L):
            net = z_list[i].astype(self.dtype)
            for conv in self.post_convs[i]:
                net = conv(net, train=train)
            for conv in self.preups_convs[i]:
                net = upsample_bilinear(net, 2)
                net = conv(net, train=train)
            post_z.append(net)

        post_c = [None] * L
        post_c[L - 1] = post_z[L - 1]
        for i in reversed(range(L - 1)):
            ups = upsample_bilinear(post_c[i + 1], 2)
            ups = self.ups_convs[i](ups, train=train)
            net = jnp.concatenate([post_z[i], ups], axis=-1)
            for conv in self.merge_convs[i]:
                net = conv(net, train=train)
            post_c[i] = net

        s = []
        for i in range(L):
            logits = self.out_convs[i](post_c[i])
            s.append(resize_nearest(logits, self.image_size).astype(jnp.float32))
        return tuple(s)

    # The PHiSeg likelihood has no x-dependent part: the sampling "cache" is
    # empty and `from_features` simply decodes.
    def features(self, x: jax.Array, *, train: bool = False):
        del x
        return ()

    def from_features(self, cache, z_list: Sequence[jax.Array]) -> Tuple[jax.Array, ...]:
        del cache
        return self(z_list, train=False)


# ---------------------------------------------------------------------------
# Probabilistic U-Net family (posteriors.py:9-52, priors.py:8-48,
# likelihoods.py:81-159)
# ---------------------------------------------------------------------------


class GlobalGaussianEncoder(nn.Module):
    """Encoder tower + global-average-pooled (mu, sigma) heads.

    Shared topology of the prob-U-Net posterior and prior
    (posteriors.py:9-52 / priors.py:8-48): R-level conv tower, 1x1 conv heads,
    softplus on sigma BEFORE the global pool (matching the reference order).
    """

    zdim0: int
    n0: int
    resolution_levels: int
    norm: str = "batch"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.tower = EncoderTower(
            n0=self.n0, resolution_levels=self.resolution_levels, norm=self.norm,
            dtype=self.dtype, name="tower",
        )
        self.mu_conv = ConvBlock(self.zdim0, kernel_size=(1, 1), activation=None,
                                 norm="none", dtype=self.dtype, name="pre_mu")
        self.sigma_conv = ConvBlock(self.zdim0, kernel_size=(1, 1), activation=nn.softplus,
                                    norm="none", dtype=self.dtype, name="pre_sigma")

    def __call__(self, inp: jax.Array, *, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        feats = self.tower(inp, train=train)[-1]
        mu = global_avg_pool(self.mu_conv(feats))
        sigma = global_avg_pool(self.sigma_conv(feats))
        return mu, sigma


class ProbUNetPosterior(nn.Module):
    """Single global latent posterior q(z | x, s) (ref posteriors.py:9-52)."""

    zdim0: int
    n0: int
    latent_levels: int  # always 1; kept for the uniform interface
    resolution_levels: int
    norm: str = "batch"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = GlobalGaussianEncoder(
            zdim0=self.zdim0, n0=self.n0, resolution_levels=self.resolution_levels,
            norm=self.norm, dtype=self.dtype, name="encoder",
        )

    def __call__(
        self, x: jax.Array, s_oh: jax.Array, rng: jax.Array, *, train: bool = False
    ) -> Tuple[ZTuple, ZTuple, ZTuple]:
        inp = jnp.concatenate([x, s_oh - 0.5], axis=-1).astype(self.dtype)
        mu, sigma = self.encoder(inp, train=train)
        z = reparameterize(rng, mu, sigma)
        return (z,), (mu,), (sigma,)


class ProbUNetPrior(nn.Module):
    """Single global latent prior p(z | x) (ref priors.py:8-48)."""

    zdim0: int
    n0: int
    latent_levels: int
    resolution_levels: int
    norm: str = "batch"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = GlobalGaussianEncoder(
            zdim0=self.zdim0, n0=self.n0, resolution_levels=self.resolution_levels,
            norm=self.norm, dtype=self.dtype, name="encoder",
        )

    def encode(self, x: jax.Array, *, train: bool = False):
        return self.encoder(x.astype(self.dtype), train=train)  # (mu, sigma)

    def heads(
        self, cache, rng: jax.Array, *, z_teacher=None, train: bool = False
    ) -> Tuple[ZTuple, ZTuple, ZTuple]:
        del z_teacher  # no hierarchy -> no teacher forcing
        mu, sigma = cache
        z = reparameterize(rng, mu, sigma)
        return (z,), (mu,), (sigma,)

    def __call__(
        self, x: jax.Array, rng: jax.Array, *, z_teacher=None, train: bool = False
    ) -> Tuple[ZTuple, ZTuple, ZTuple]:
        return self.heads(self.encode(x, train=train), rng, z_teacher=z_teacher, train=train)


class ProbUNetLikelihood(nn.Module):
    """U-Net likelihood with late z-broadcast (ref likelihoods.py:81-159).

    The z vector is tiled over the spatial grid, concatenated onto the last
    decoder feature map and mixed in with three 1x1 conv blocks before the
    prediction head (likelihoods.py:147-157).
    """

    n0: int
    resolution_levels: int
    nlabels: int
    image_size: Tuple[int, int]
    norm: str = "batch"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.unet = UNetCore(n0=self.n0, resolution_levels=self.resolution_levels,
                             norm=self.norm, dtype=self.dtype, name="unet")
        self.recomb = [
            ConvBlock(self.n0, kernel_size=(1, 1), norm=self.norm, dtype=self.dtype,
                      name=f"recomb{k}")
            for k in range(3)
        ]
        self.pred = ConvBlock(self.nlabels, kernel_size=(1, 1), activation=None,
                              norm="none", dtype=self.dtype, name="prediction")

    def features(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        return self.unet(x.astype(self.dtype), train=train)

    def from_features(self, feats: jax.Array, z_list: Sequence[jax.Array], *,
                      train: bool = False) -> Tuple[jax.Array, ...]:
        z = z_list[0].astype(self.dtype)  # (B, zdim)
        b = feats.shape[0]
        h, w = feats.shape[1], feats.shape[2]
        z_b = jnp.broadcast_to(z[:, None, None, :], (b, h, w, z.shape[-1]))
        net = jnp.concatenate([feats, z_b], axis=-1)
        for conv in self.recomb:
            net = conv(net, train=train)
        return (self.pred(net).astype(jnp.float32),)

    def __call__(
        self, z_list: Sequence[jax.Array], x: jax.Array, *, train: bool = False
    ) -> Tuple[jax.Array, ...]:
        return self.from_features(self.features(x, train=train), z_list, train=train)


# ---------------------------------------------------------------------------
# Deterministic U-Net family (likelihoods.py:10-79; dummy posterior/prior
# posteriors.py:135-138, priors.py:130-133)
# ---------------------------------------------------------------------------


class DetUNetLikelihood(nn.Module):
    """Plain U-Net p(s | x); ignores latents (ref likelihoods.py:10-79)."""

    n0: int
    resolution_levels: int
    nlabels: int
    image_size: Tuple[int, int]
    norm: str = "batch"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.unet = UNetCore(n0=self.n0, resolution_levels=self.resolution_levels,
                             norm=self.norm, dtype=self.dtype, name="unet")
        self.recomb = [
            ConvBlock(self.n0, kernel_size=(1, 1), norm=self.norm, dtype=self.dtype,
                      name=f"recomb{k}")
            for k in range(3)
        ]
        self.pred = ConvBlock(self.nlabels, kernel_size=(1, 1), activation=None,
                              norm="none", dtype=self.dtype, name="prediction")

    def features(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        net = self.unet(x.astype(self.dtype), train=train)
        for conv in self.recomb:
            net = conv(net, train=train)
        return self.pred(net).astype(jnp.float32)

    def from_features(self, logits: jax.Array, z_list=None) -> Tuple[jax.Array, ...]:
        del z_list
        return (logits,)

    def __call__(
        self, z_list, x: jax.Array, *, train: bool = False
    ) -> Tuple[jax.Array, ...]:
        del z_list
        return self.from_features(self.features(x, train=train))
