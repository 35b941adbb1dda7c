"""Per-level sample construction figures (Laplacian-pyramid decomposition).

Equivalent of `phiseg_sample_construction.py` (ref :23-137): for selected
test images, draw one prior sample and visualise each latent level's residual
logit contribution and the accumulated segmentation from the coarsest level
down -- showing how the hierarchy composes a sample.

Usage:
  python -m phiseg_tpu.cli.sample_construction <log_dir> [--indices 0 1]
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


def generate(log_dir: str, tag: str = "best_ged", indices=None,
             out_dir: str | None = None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from phiseg_tpu.data import get_dataset
    from phiseg_tpu.engine.loading import load_experiment
    from phiseg_tpu.engine.train import make_sample_levels_fn

    cfg, model, state, step = load_experiment(log_dir, tag)
    data = get_dataset(cfg)
    sampler = make_sample_levels_fn(model, 1)
    variables = state.variables

    out_dir = out_dir or os.path.join(log_dir, "sample_construction")
    os.makedirs(out_dir, exist_ok=True)
    indices = indices or list(range(min(2, data.test.images.shape[0])))
    rng = jax.random.PRNGKey(cfg.seed + 13)

    for idx in indices:
        x = np.asarray(data.test.images[idx]).astype(np.float32)[None, ..., None]
        levels = sampler(variables, jnp.asarray(x), jax.random.fold_in(rng, idx))
        levels = [np.asarray(l)[0, 0] for l in levels]  # L x (H,W,C)
        L = len(levels)

        fig, axes = plt.subplots(3, L + 1, figsize=(1.6 * (L + 1), 5))
        for ax in axes.ravel():
            ax.axis("off")
        axes[0, 0].imshow(x[0, ..., 0], cmap="gray")
        axes[0, 0].set_title("input", fontsize=7)

        # residual contribution per level (fg-bg logit difference)
        accum = np.zeros_like(levels[0])
        for col, lvl in enumerate(reversed(range(L))):  # coarsest first
            resid = levels[lvl]
            accum = accum + resid
            axes[0, col + 1].imshow(resid[..., -1] - resid[..., 0], cmap="coolwarm")
            axes[0, col + 1].set_title(f"residual lvl {lvl}", fontsize=7)
            axes[1, col + 1].imshow(accum.argmax(-1), vmin=0, vmax=cfg.nlabels - 1)
            axes[1, col + 1].set_title(f"accum seg >= lvl {lvl}", fontsize=7)
            sm = np.exp(accum) / np.exp(accum).sum(-1, keepdims=True)
            axes[2, col + 1].imshow(sm[..., -1], cmap="viridis", vmin=0, vmax=1)
            axes[2, col + 1].set_title("accum softmax fg", fontsize=7)

        path = os.path.join(out_dir, f"construction_img{idx}_{tag}.png")
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        log.info("wrote %s", path)
    return out_dir


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("log_dir")
    p.add_argument("--tag", default="best_ged")
    p.add_argument("--indices", type=int, nargs="*", default=None)
    p.add_argument("--out-dir", default=None)
    a = p.parse_args(argv)
    generate(a.log_dir, a.tag, a.indices, a.out_dir)


if __name__ == "__main__":
    main()
