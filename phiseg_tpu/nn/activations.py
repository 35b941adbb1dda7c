"""Activation functions (ref tfwrapper/activations.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def leaky_relu(x: jax.Array, alpha: float = 0.01) -> jax.Array:
    """max(x, alpha*x) (ref activations.py:3-4)."""
    return jnp.maximum(x, alpha * x)


relu = jax.nn.relu
softplus = jax.nn.softplus
identity = lambda x: x  # noqa: E731  (ref normalisation.identity / tf.identity)
