"""Animated GIF of prior segmentation samples.

Equivalent of `phiseg_makegif_samples.py` (ref :52-163): draw N prior samples
for selected test images and write an animated GIF cycling through them with
the segmentation contour overlaid on the input.

Usage:
  python -m phiseg_tpu.cli.makegif_samples <log_dir> [--samples 20] [--indices 0]
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


def _to_uint8(img: np.ndarray) -> np.ndarray:
    img = img - img.min()
    img = img / max(img.max(), 1e-12)
    return (img * 255).astype(np.uint8)


def _contour(mask: np.ndarray) -> np.ndarray:
    """Binary contour via erosion difference (no cv2 needed)."""
    m = mask.astype(bool)
    er = m.copy()
    er[1:, :] &= m[:-1, :]
    er[:-1, :] &= m[1:, :]
    er[:, 1:] &= m[:, :-1]
    er[:, :-1] &= m[:, 1:]
    return m & ~er


def generate(log_dir: str, num_samples: int = 20, tag: str = "best_ged",
             indices=None, out_dir: str | None = None, fps: int = 4):
    from PIL import Image

    from phiseg_tpu.data import get_dataset
    from phiseg_tpu.engine.loading import load_experiment
    from phiseg_tpu.engine.train import make_sample_fn

    cfg, model, state, step = load_experiment(log_dir, tag)
    data = get_dataset(cfg)
    sampler = make_sample_fn(model, num_samples)
    variables = state.variables

    out_dir = out_dir or os.path.join(log_dir, "gifs")
    os.makedirs(out_dir, exist_ok=True)
    indices = indices or list(range(min(2, data.test.images.shape[0])))
    rng = jax.random.PRNGKey(cfg.seed + 23)

    for idx in indices:
        x = np.asarray(data.test.images[idx]).astype(np.float32)
        probs = np.asarray(
            sampler(variables, jnp.asarray(x[None, ..., None]),
                    jax.random.fold_in(rng, idx))
        )[:, 0]
        masks = probs.argmax(-1)  # (S,H,W)

        base = _to_uint8(x)
        frames = []
        for s in range(num_samples):
            frame = np.stack([base, base, base], -1)
            ct = _contour(masks[s] > 0)
            frame[ct] = [255, 64, 64]
            frames.append(Image.fromarray(frame).resize(
                (4 * x.shape[1], 4 * x.shape[0]), Image.NEAREST))

        path = os.path.join(out_dir, f"samples_img{idx}_{tag}.gif")
        frames[0].save(path, save_all=True, append_images=frames[1:],
                       duration=int(1000 / fps), loop=0)
        log.info("wrote %s", path)
    return out_dir


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("log_dir")
    p.add_argument("--samples", type=int, default=20)
    p.add_argument("--tag", default="best_ged")
    p.add_argument("--indices", type=int, nargs="*", default=None)
    p.add_argument("--out-dir", default=None)
    a = p.parse_args(argv)
    generate(a.log_dir, a.samples, a.tag, a.indices, a.out_dir)


if __name__ == "__main__":
    main()
