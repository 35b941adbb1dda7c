"""Per-level / per-layer training diagnostics for TensorBoard parity.

The reference wires three monitoring families into its summary graph:
  * per-level mu/sigma means for posterior AND prior
    (phiseg/phiseg_model.py:719-726, tags average_[prior_]{mu,sigma}_lvl%d);
  * per-level output + accumulated-output image grids
    (phiseg_model.py:728-736, tags {train,val}_s_out[_list_%d|_accum_list_%d]);
  * weight/activation histograms auto-attached by every layer
    (tfwrapper/layers.py:671-677).

TPU-native equivalent: ONE jitted diagnostics program per validation that
returns scalar reductions, small argmax label maps for the grids, and
device-side histogram summaries (min/max/num/sum/sum_sq + 30 bucket counts,
~70 floats per tensor) -- raw activations never cross the host boundary,
which matters through the axon tunnel. Activations come from Flax's
capture_intermediates on the eval forward.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from phiseg_tpu.nn.losses import one_hot


def tensor_histogram(x: jax.Array, bins: int = 30) -> Dict[str, jax.Array]:
    """Device-side histogram summary of one tensor (jit-safe, static shapes)."""
    v = x.astype(jnp.float32).ravel()
    counts, edges = jnp.histogram(v, bins=bins)
    return {
        "min": v.min(),
        "max": v.max(),
        "num": jnp.asarray(float(v.size), jnp.float32),
        "sum": v.sum(),
        "sum_squares": jnp.square(v).sum(),
        "bucket_limits": edges[1:],
        "bucket_counts": counts.astype(jnp.float32),
    }


def _path_name(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", None)
        if key is None:
            key = getattr(p, "idx", None)
        parts.append(str(key))
    return "/".join(parts)


def _tree_histograms(tree: Any, prefix: str, bins: int = 30) -> Dict[str, Dict]:
    out: Dict[str, Dict] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(leaf.dtype, jnp.floating):
            continue
        if leaf.size < 2:
            continue
        out[f"{prefix}/{_path_name(path)}"] = tensor_histogram(leaf, bins)
    return out


def make_param_hist_fn(bins: int = 30):
    """Jitted params -> {layer path: histogram summary} (the 'weights' half
    of the reference's per-layer _add_summaries hook)."""

    @jax.jit
    def param_hists(params):
        return _tree_histograms(params, "weights", bins)

    return param_hists


def make_diag_fn(model, cfg, histograms: bool = True):
    """Jitted diagnostics forward.

    Returns (scalars, grids, hists):
      scalars: average_[prior_]{mu,sigma}_lvl%d per latent level;
      grids:   int32 label maps {s_out, s_out_list_%d, s_accum_list_%d},
               accumulation from the coarsest level down
               (ref add_residual_multinoulli_loss s_accum recursion :250-258);
      hists:   activation histogram summaries from capture_intermediates
               (empty when histograms=False).
    """

    @jax.jit
    def diag(variables, x, s, rng):
        s_oh = one_hot(s, cfg.nlabels)
        if histograms:
            outputs, inter = model.apply(
                variables, x, s_oh, rng, train=False,
                capture_intermediates=True, mutable=["intermediates"],
            )
            hists = _tree_histograms(inter["intermediates"], "activations")
        else:
            outputs = model.apply(variables, x, s_oh, rng, train=False)
            hists = {}

        scalars = {}
        for i, (qm, qs, pm, ps) in enumerate(
            zip(outputs.q_mu, outputs.q_sigma, outputs.p_mu, outputs.p_sigma)
        ):
            scalars[f"average_mu_lvl{i}"] = qm.astype(jnp.float32).mean()
            scalars[f"average_sigma_lvl{i}"] = qs.astype(jnp.float32).mean()
            scalars[f"average_prior_mu_lvl{i}"] = pm.astype(jnp.float32).mean()
            scalars[f"average_prior_sigma_lvl{i}"] = ps.astype(jnp.float32).mean()

        s_list = outputs.s_out_list
        n = len(s_list)
        accum = [None] * n
        accum[n - 1] = s_list[n - 1]
        for i in range(n - 2, -1, -1):
            accum[i] = accum[i + 1] + s_list[i]
        grids = {"s_out": jnp.argmax(accum[0], axis=-1).astype(jnp.int32)}
        for i in range(n):
            grids[f"s_out_list_{i}"] = jnp.argmax(s_list[i], axis=-1).astype(jnp.int32)
            grids[f"s_accum_list_{i}"] = jnp.argmax(accum[i], axis=-1).astype(jnp.int32)
        return scalars, grids, hists

    return diag


def first_conv_kernel(params) -> Tuple[str, Any]:
    """First 4-D conv kernel in deterministic traversal order, for the
    kernel-grid viz (ref put_kernels_on_grid, tfwrapper/utils.py:93-168)."""
    fallback = ("", None)
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if hasattr(leaf, "ndim") and leaf.ndim == 4:
            if leaf.shape[0] > 1 and leaf.shape[1] > 1:  # spatial conv
                return _path_name(path), leaf
            if fallback[1] is None:
                fallback = (_path_name(path), leaf)
    return fallback
