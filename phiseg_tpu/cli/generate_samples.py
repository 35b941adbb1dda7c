"""Qualitative sample generation: sample grids + uncertainty error maps.

Equivalent of `phiseg_generate_samples.py` (ref :46-187): for selected test
images draw N prior samples, save a figure with the input, 16 sample
segmentations and all GT annotations, plus the three error maps
  E_ss -- expected xent of samples vs. their mean (model uncertainty)
  E_sy -- expected xent of samples vs. the GTs    (model-vs-raters)
  E_yy -- expected xent of GTs vs. their mean     (inter-rater)
(ref generate_error_maps :46-83).

Usage:
  python -m phiseg_tpu.cli.generate_samples <log_dir> [--samples 100]
      [--indices 10 20 30] [--tag best_ged]
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


def error_maps(sample_probs: np.ndarray, gt_oh: np.ndarray, eps: float = 1e-8):
    """E_ss, E_sy, E_yy pixel maps (ref phiseg_generate_samples.py:46-83)."""
    mean_s = sample_probs.mean(0)
    log_s = np.log(sample_probs + eps)
    e_ss = -np.einsum("hwc,nhwc->hw", mean_s, log_s) / sample_probs.shape[0]
    e_sy = -np.einsum("mhwc,nhwc->hw", gt_oh, log_s) / (
        sample_probs.shape[0] * gt_oh.shape[0]
    )
    mean_y = gt_oh.mean(0)
    e_yy = -np.einsum("hwc,mhwc->hw", mean_y, np.log(gt_oh + eps)) / gt_oh.shape[0]
    return e_ss, e_sy, e_yy


def generate(log_dir: str, num_samples: int = 100, tag: str = "best_ged",
             indices=None, out_dir: str | None = None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from phiseg_tpu.data import get_dataset
    from phiseg_tpu.engine.loading import load_experiment
    from phiseg_tpu.engine.train import make_sample_fn

    cfg, model, state, step = load_experiment(log_dir, tag)
    data = get_dataset(cfg)
    sampler = make_sample_fn(model, num_samples)
    variables = state.variables

    out_dir = out_dir or os.path.join(log_dir, "samples")
    os.makedirs(out_dir, exist_ok=True)
    indices = indices or list(range(min(4, data.test.images.shape[0])))
    rng = jax.random.PRNGKey(cfg.seed + 7)

    for idx in indices:
        x = np.asarray(data.test.images[idx]).astype(np.float32)[None, ..., None]
        gts = np.asarray(data.test.labels[idx]).astype(np.int32)  # (H,W,M)
        probs = np.asarray(sampler(variables, jnp.asarray(x),
                                   jax.random.fold_in(rng, idx)))[:, 0]  # (S,H,W,C)
        masks = probs.argmax(-1)

        n_show = min(16, num_samples)
        m = gts.shape[-1]
        cols = max(n_show, m + 1, 3)  # >= 3 for the error-map row
        fig, axes = plt.subplots(3, cols, figsize=(1.2 * cols, 4))
        for ax in axes.ravel():
            ax.axis("off")
        axes[0, 0].imshow(x[0, ..., 0], cmap="gray")
        axes[0, 0].set_title("input", fontsize=6)
        for j in range(m):
            axes[0, j + 1].imshow(gts[..., j], vmin=0, vmax=cfg.nlabels - 1)
            axes[0, j + 1].set_title(f"GT {j}", fontsize=6)
        for j in range(n_show):
            axes[1, j].imshow(masks[j], vmin=0, vmax=cfg.nlabels - 1)

        gt_oh = np.eye(cfg.nlabels, dtype=np.float32)[gts.transpose(2, 0, 1)]
        e_ss, e_sy, e_yy = error_maps(probs, gt_oh)
        for j, (name, e) in enumerate([("E_ss", e_ss), ("E_sy", e_sy), ("E_yy", e_yy)]):
            axes[2, j].imshow(e, cmap="magma")
            axes[2, j].set_title(name, fontsize=6)

        path = os.path.join(out_dir, f"samples_img{idx}_{tag}.png")
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        log.info("wrote %s", path)
    return out_dir


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("log_dir")
    p.add_argument("--samples", type=int, default=100)
    p.add_argument("--tag", default="best_ged")
    p.add_argument("--indices", type=int, nargs="*", default=None)
    p.add_argument("--out-dir", default=None)
    a = p.parse_args(argv)
    generate(a.log_dir, a.samples, a.tag, a.indices, a.out_dir)


if __name__ == "__main__":
    main()
