"""On-device data augmentation (runs inside the jitted train step).

TPU-first re-design of the reference's host-side cv2 augmentation pipeline
(data/batch_provider.py:140-271: rotation, scale-crop, 3x3 coarse elastic
deformation, flips, every-nth gating). The reference resampled the image
once per transform on the host CPU; here all transforms compose into ONE
backward coordinate map per image and a single bilinear resampling,
vectorised over the batch with vmap. The resampling itself runs as MXU
matmuls, not a gather (see _bilinear_warp). Labels are warped as one-hot
and argmax'd, matching the reference's rotate/resize/warp_as_onehot
treatment (utils.py:24-67).

Gating matches the reference distributions:
  * geometric transforms fire together with prob 1/augment_every_nth
    (batch_provider.py:193-194)
  * each flip independently with prob 1/max(2, augment_every_nth)
    (batch_provider.py:252-264)
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, Tuple

import jax
import jax.numpy as jnp


def _bilinear_warp(img: jax.Array, ys: jax.Array, xs: jax.Array,
                   fill: float = 0.0) -> jax.Array:
    """Sample img (H,W,C) at float coords ys/xs (H,W); constant fill outside.

    MXU formulation: instead of a 4-corner 2D gather (which XLA:TPU lowers to
    a serial per-element fusion measured at ~1.2 ms/image -- the dominant cost
    of the whole train step in the round-2 profile), bilinear interpolation is
    expressed through hat-function weight matrices contracted on the MXU:

        Wx[i,j,x] = max(0, 1 - |xs[i,j] - x|)   (<= 2 nonzeros per (i,j))
        T[i,j,y]  = sum_x Wx[i,j,x] * img[y,x]  (one (H*W,W)@(W,H*C) matmul)
        out[i,j]  = sum_y Wy[i,j,y] * T[i,j,y]  (elementwise reduce)

    For in-range coords the two adjacent hat weights are exactly
    (1-frac, frac), so this is bit-identical bilinear sampling at integer
    coords (identity warps stay exact) and costs ~1.6 GFLOP/image -- ~10 us
    of MXU time vs milliseconds of gather.

    Memory: the intermediate T is (H, W, H, C) float32 -- O(H^2*W*C) HBM per
    image, quadratic in resolution (128^2 mono: 8 MB/image; 192^2: ~40 MB;
    256^2: ~128 MB). Fine at the LIDC 128^2 configs; higher-resolution
    configs should expect HBM pressure here before anywhere else in the
    step (mitigation: checkpoint/remat the warp or chunk over rows).
    """
    h, w = img.shape[0], img.shape[1]
    xw = jnp.maximum(0.0, 1.0 - jnp.abs(xs[..., None] - jnp.arange(w, dtype=xs.dtype)))
    yw = jnp.maximum(0.0, 1.0 - jnp.abs(ys[..., None] - jnp.arange(h, dtype=ys.dtype)))
    t = jnp.einsum("ijx,yxc->ijyc", xw, img,
                   preferred_element_type=jnp.float32)
    out = jnp.einsum("ijy,ijyc->ijc", yw, t)
    valid = (ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1)
    return jnp.where(valid[..., None], out, fill)


def _augment_one(x: jax.Array, s_oh: jax.Array, rng: jax.Array,
                 opts: Mapping[str, Any]) -> Tuple[jax.Array, jax.Array]:
    """Augment one (H,W,C) image + (H,W,L) one-hot label with a single warp."""
    h, w = x.shape[0], x.shape[1]
    every_nth = int(opts.get("augment_every_nth", 2))
    k_coin, k_rot, k_r, k_px, k_py, k_el, k_flr, k_fud = jax.random.split(rng, 8)

    do_geom = (jax.random.randint(k_coin, (), 0, every_nth) == 0).astype(jnp.float32)
    any_warp = any(opts.get(k, False)
                   for k in ("do_rotations", "do_scaleaug", "do_elasticaug"))

    # output pixel grid
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")

    # elastic: 3x3 coarse N(0, sigma) field, bicubic upsampled
    # (batch_provider.py:227-248); remap convention out(p) = in(p + d(p)).
    if opts.get("do_elasticaug", False):
        sigma = 10.0
        d = sigma * jax.random.normal(k_el, (2, 3, 3), jnp.float32) * do_geom
        d_full = jax.image.resize(d.transpose(1, 2, 0), (h, w, 2), method="bicubic")
        xx = xx + d_full[..., 0]
        yy = yy + d_full[..., 1]

    # scale-crop: square side r from [H-offset, H], random origin; resize back
    # (batch_provider.py:211-224). Backward: src = origin + dst * r / H.
    # Gated with a coordinate select (NOT by folding the coin into r, which
    # is only an identity for square images); r is clamped to the short side
    # so non-square inputs stay in bounds.
    if opts.get("do_scaleaug", False):
        offset = float(opts.get("offset", 30))
        short = min(h, w)
        r = jax.random.randint(k_r, (), max(short - int(offset), 1),
                               short + 1).astype(jnp.float32)
        px = jnp.floor(jax.random.uniform(k_px) * (w - r + 1.0))
        py = jnp.floor(jax.random.uniform(k_py) * (h - r + 1.0))
        xx = jnp.where(do_geom > 0, px + xx * (r / w), xx)
        yy = jnp.where(do_geom > 0, py + yy * (r / h), yy)

    # rotation about the image centre (batch_provider.py:197-208)
    if opts.get("do_rotations", False):
        degrees = float(opts.get("rot_degrees", 10.0))
        ang = jnp.deg2rad(jax.random.uniform(k_rot, (), minval=-degrees, maxval=degrees))
        ang = ang * do_geom
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        dxc, dyc = xx - cx, yy - cy
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        xx = cx + cos * dxc - sin * dyc
        yy = cy + sin * dxc + cos * dyc

    if any_warp:
        # one joint warp so the weight matrices are built/contracted once
        both = _bilinear_warp(
            jnp.concatenate([x.astype(jnp.float32), s_oh], axis=-1), yy, xx,
            fill=0.0,
        )
        x_out = both[..., : x.shape[-1]].astype(x.dtype)
        s_out = both[..., x.shape[-1]:]
    else:
        x_out, s_out = x, s_oh

    # flips last, as exact array reversals (ref batch_provider.py:252-264).
    # NB: folding flips into the gather coordinates makes XLA:TPU lower the
    # gather pathologically (~40ms/batch); reversals are layout ops.
    flip_p = 1.0 / max(2, every_nth)
    if opts.get("do_fliplr", False):
        flr = jax.random.bernoulli(k_flr, flip_p)
        x_out = jnp.where(flr, x_out[:, ::-1, :], x_out)
        s_out = jnp.where(flr, s_out[:, ::-1, :], s_out)
    if opts.get("do_flipud", False):
        fud = jax.random.bernoulli(k_fud, flip_p)
        x_out = jnp.where(fud, x_out[::-1, :, :], x_out)
        s_out = jnp.where(fud, s_out[::-1, :, :], s_out)
    return x_out, s_out


def make_augment_fn(opts: Mapping[str, Any], nlabels: int):
    """Build a jittable batch augmentation fn(x, s, rng) -> (x, s).

    x: (B,H,W,C) float; s: (B,H,W) int. One-hot fill outside the warp is all
    zeros which argmaxes to background label 0 (same effective border
    behaviour as cv2's zero borderValue in the reference).
    """
    from phiseg_tpu.data.batch_provider import canonicalise_aug_options

    opts = canonicalise_aug_options(opts)

    def augment(x: jax.Array, s: jax.Array, rng: jax.Array):
        s_oh = jax.nn.one_hot(s, nlabels, dtype=jnp.float32)
        keys = jax.random.split(rng, x.shape[0])
        fn = functools.partial(_augment_one, opts=opts)
        x_out, s_oh_out = jax.vmap(fn)(x, s_oh, keys)
        return x_out, jnp.argmax(s_oh_out, axis=-1).astype(s.dtype)

    return augment
