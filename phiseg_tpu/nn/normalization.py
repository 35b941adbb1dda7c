"""Batch renormalisation (the one norm flax doesn't ship).

Equivalent of the reference `batch_renorm` (tfwrapper/normalisation.py:72-142,
Ioffe 2017): batch norm whose train-time normalisation uses the running
statistics via clipped correction factors r and d, with the clip limits
(rmax, dmax) linearly scheduled on the global step from (1, 0) to (3, 5)
over steps 500->4000 / 500->2500 (the reference's /10-scaled schedule).

The other norms (batch/group/layer/instance) live in ConvBlock
(phiseg_tpu/nn/layers.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _scheduled_clip(step, y_min, y_max, x_min, x_max):
    x = step.astype(jnp.float32)
    y = (x - x_min) * (y_max - y_min) / (x_max - x_min) + y_min
    return jnp.clip(y, y_min, y_max)


class BatchRenorm(nn.Module):
    """Batch renorm over NHWC with scheduled r/d clipping."""

    momentum: float = 0.99
    epsilon: float = 1e-3
    rmax_schedule: tuple = (1.0, 3.0, 500.0, 4000.0)   # (ymin, ymax, xmin, xmax)
    dmax_schedule: tuple = (0.0, 5.0, 500.0, 2500.0)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False,
                 step: jax.Array | int | None = None) -> jax.Array:
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        # Self-counting step for the clip schedule (the reference reads the
        # TF global step, normalisation.py:123); an explicit `step` overrides.
        step_var = self.variable("batch_stats", "steps",
                                 lambda: jnp.zeros((), jnp.int32))
        if step is None:
            step = step_var.value
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))

        x32 = x.astype(jnp.float32)
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axis=axes)
            var = jnp.var(x32, axis=axes)
            sigma = jnp.sqrt(var + self.epsilon)
            ra_sigma = jnp.sqrt(ra_var.value + self.epsilon)

            step_arr = jnp.asarray(step)
            rmax = _scheduled_clip(step_arr, *self.rmax_schedule)
            dmax = _scheduled_clip(step_arr, *self.dmax_schedule)
            r = jax.lax.stop_gradient(jnp.clip(sigma / ra_sigma, 1.0 / rmax, rmax))
            d = jax.lax.stop_gradient(
                jnp.clip((mean - ra_mean.value) / ra_sigma, -dmax, dmax)
            )
            out = (x32 - mean) / sigma * r + d
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
                step_var.value = step_var.value + 1
        else:
            out = (x32 - ra_mean.value) * jax.lax.rsqrt(ra_var.value + self.epsilon)

        out = out * scale + bias
        return out.astype(x.dtype)
