"""Fused multi-scale residual cross-entropy as a Pallas TPU kernel.

The PHiSeg objective evaluates softmax cross-entropy on the RESIDUALLY
ACCUMULATED per-level logits: level i's logits are sum_{j>=i} s_out[j]
(ref phiseg/phiseg_model.py:241-262). Done naively, that materialises L
accumulated (B,H,W,C) arrays plus their log-softmax intermediates in HBM --
at L=5 levels the logits tensor is re-read/re-written many times.

This kernel reads each level's logits from HBM exactly ONCE: it streams
pixel tiles through VMEM, builds the level accumulation in registers/VMEM,
and reduces all L per-level CE sums in a single pass. The custom VJP is a
second single-pass kernel producing all L logit gradients (the per-level
softmax terms and their ascending cumulative sum) with one read of the same
data.

Layout: (L,B,H,W,C) logits are viewed as (L*C, P) with the P = B*H*W pixel
axis on lanes (tiles of TILE_P), so the tiny class axis (C=2 for LIDC) rides
the sublanes instead of wasting lanes. Forward output: per-tile partial sums,
reduced on the host side of the pallas_call.

Numerics match nn.losses.multinoulli_loss_with_logits: f32 log-sum-exp with
max subtraction; per-pixel CE summed over pixels and divided by B.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_P = 4096


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(levels: int, nclass: int, tile_p: int, total_p: int,
                logits_ref, labels_ref, out_ref):
    """One pixel tile: all-level accumulated CE partial sums.

    The TPU grid is sequential, so the (8, 128) output block (full array,
    same block every step) accumulates safely across tiles.
    """
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    base = pid * tile_p
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, tile_p), 1) + base
    mask = (pos < total_p).astype(jnp.float32)  # (1, TILE_P)

    labels = labels_ref[:, :]  # (C, TILE_P)
    acc = jnp.zeros((nclass, tile_p), jnp.float32)
    # Per-level sums land in row 0, lane i -- selected with iota masks since
    # Pallas TPU supports neither scalar VMEM stores nor scatter.
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    contrib = jnp.zeros((8, 128), jnp.float32)
    for i in reversed(range(levels)):
        acc = acc + logits_ref[i * nclass:(i + 1) * nclass, :].astype(jnp.float32)
        m = jnp.max(acc, axis=0, keepdims=True)
        lse = m + jnp.log(jnp.sum(jnp.exp(acc - m), axis=0, keepdims=True))
        dot = jnp.sum(labels * acc, axis=0, keepdims=True)
        ce = jnp.sum((lse - dot) * mask)  # scalar partial for this tile
        contrib = contrib + jnp.where((rows == 0) & (cols == i), ce, 0.0)
    out_ref[:, :] = out_ref[:, :] + contrib


def _bwd_kernel(levels: int, nclass: int, tile_p: int, total_p: int,
                logits_ref, labels_ref, g_ref, grad_ref, scratch):
    """One pixel tile: gradients for every level in one pass.

    grad_logits[j] = sum_{i<=j} g_i * (softmax(acc_i) - y); acc_i built
    coarsest->finest, cumulative sum written finest->coarsest.
    """
    pid = pl.program_id(0)
    base = pid * tile_p
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, tile_p), 1) + base
    mask = (pos < total_p).astype(jnp.float32)

    labels = labels_ref[:, :]
    acc = jnp.zeros((nclass, tile_p), jnp.float32)
    for i in reversed(range(levels)):
        acc = acc + logits_ref[i * nclass:(i + 1) * nclass, :].astype(jnp.float32)
        m = jnp.max(acc, axis=0, keepdims=True)
        lse = m + jnp.log(jnp.sum(jnp.exp(acc - m), axis=0, keepdims=True))
        sm = jnp.exp(acc - lse)
        gi = g_ref[0, i]
        scratch[i * nclass:(i + 1) * nclass, :] = gi * (sm - labels) * mask

    running = jnp.zeros((nclass, tile_p), jnp.float32)
    for j in range(levels):
        running = running + scratch[j * nclass:(j + 1) * nclass, :]
        grad_ref[j * nclass:(j + 1) * nclass, :] = running


def _prep(stacked_logits: jax.Array, s_oh: jax.Array, tile_p: int):
    levels, b = stacked_logits.shape[0], stacked_logits.shape[1]
    nclass = stacked_logits.shape[-1]
    p = b * stacked_logits.shape[2] * stacked_logits.shape[3]
    p_pad = -(-p // tile_p) * tile_p
    # (L,B,H,W,C) -> (L, C, P) -> (L*C, P_pad)
    lg = jnp.moveaxis(stacked_logits.reshape(levels, p, nclass), -1, 1)
    lg = lg.reshape(levels * nclass, p)
    lb = jnp.moveaxis(s_oh.reshape(p, nclass), -1, 0)
    if p_pad != p:
        lg = jnp.pad(lg, ((0, 0), (0, p_pad - p)))
        lb = jnp.pad(lb, ((0, 0), (0, p_pad - p)))
    return lg, lb.astype(jnp.float32), levels, nclass, b, p, p_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_residual_ce(stacked_logits: jax.Array, s_oh: jax.Array,
                      tile_p: int = DEFAULT_TILE_P) -> jax.Array:
    """Per-level accumulated CE losses.

    stacked_logits: (L,B,H,W,C); s_oh: (B,H,W,C) one-hot.
    Returns (L,) f32 where out[i] = mean_b sum_px CE(sum_{j>=i} logits[j], y).
    """
    return _fwd(stacked_logits, s_oh, tile_p)[0]


def _fwd(stacked_logits, s_oh, tile_p):
    lg, lb, levels, nclass, b, p, p_pad = _prep(stacked_logits, s_oh, tile_p)
    num_tiles = p_pad // tile_p

    sums = pl.pallas_call(
        functools.partial(_fwd_kernel, levels, nclass, tile_p, p),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((levels * nclass, tile_p), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nclass, tile_p), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=_use_interpret(),
    )(lg, lb)

    per_level = sums[0, :levels] / b
    return per_level, (stacked_logits, s_oh)


def _fwd_rule(stacked_logits, s_oh, tile_p):
    per_level, res = _fwd(stacked_logits, s_oh, tile_p)
    return per_level, res


def _bwd_rule(tile_p, res, g):
    stacked_logits, s_oh = res
    lg, lb, levels, nclass, b, p, p_pad = _prep(stacked_logits, s_oh, tile_p)
    num_tiles = p_pad // tile_p
    g_row = jnp.zeros((1, 128), jnp.float32).at[0, :levels].set(
        g.astype(jnp.float32) / b
    )

    grad_flat = pl.pallas_call(
        functools.partial(_bwd_kernel, levels, nclass, tile_p, p),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((levels * nclass, tile_p), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nclass, tile_p), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((levels * nclass, tile_p), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((levels * nclass, p_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((levels * nclass, tile_p), jnp.float32)],
        interpret=_use_interpret(),
    )(lg, lb, g_row)

    grad_flat = grad_flat[:, :p].reshape(levels, nclass, p)
    grad = jnp.moveaxis(grad_flat, 1, -1).reshape(stacked_logits.shape)
    return grad.astype(stacked_logits.dtype), None


fused_residual_ce.defvjp(_fwd_rule, _bwd_rule)


def fused_residual_ce_dp(stacked_logits: jax.Array, s_oh: jax.Array,
                         mesh, tile_p: int = DEFAULT_TILE_P) -> jax.Array:
    """Data-parallel fused CE: the Pallas kernel under shard_map.

    GSPMD cannot auto-partition a Mosaic custom call, so under a mesh each
    device runs the kernel on its LOCAL batch shard and the per-level means
    are pmean'd (equal shards -> equals the global batch mean). Differentiable
    through shard_map; gradients come out batch-sharded like the logits.
    """
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def local(lg, so):
        per_level = fused_residual_ce(lg, so, tile_p)
        return jax.lax.pmean(per_level, axis)

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # metadata, which the checker would otherwise demand.
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )(stacked_logits, s_oh)
