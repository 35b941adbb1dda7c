"""Segmentation-accuracy evaluation: per-label Dice over the test set.

Equivalent of `phiseg_test_predictions.py` (ref :28-94): restore the
`best_dice` checkpoint, predict each test image as the argmax of the MEAN
softmax over N prior samples (N=100, or 1 for the deterministic U-Net,
ref :40), score per-label Dice against each annotator's mask with the
both-empty->1 / one-empty->0 convention (ref :72-78), save
dice_{tag}.npz.

Usage:
  python -m phiseg_tpu.cli.test_predictions <log_dir> [--samples 100]
      [--tag best_dice] [--batch 8]
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


def evaluate(log_dir: str, num_samples: int = 100, tag: str = "best_dice",
             batch: int = 8, max_images: int | None = None, mesh: bool = False,
             synth_n_test: int | None = None):
    from phiseg_tpu.data import get_dataset
    from phiseg_tpu.engine.loading import load_experiment
    from phiseg_tpu.engine.train import make_sample_fn
    from phiseg_tpu.metrics import dice_per_label

    cfg, model, state, step = load_experiment(log_dir, tag)
    log.info("restored %s @ step %d", tag, step)
    if cfg.model_family == "det_unet":
        num_samples = 1  # deterministic net: one draw (ref :40)
    if synth_n_test is not None:
        cfg = cfg.replace(synth_n_test=synth_n_test)  # see test_quantitative
    data = get_dataset(cfg)
    device_mesh = None
    if mesh and num_samples > 1:
        from phiseg_tpu.parallel import make_mesh

        device_mesh = make_mesh()
        log.info("sample-parallel eval over %d devices", device_mesh.size)
    sampler = make_sample_fn(model, num_samples, mesh=device_mesh)
    variables = state.variables

    @jax.jit
    def predict_and_score(x, s_sel, rng):
        probs = sampler(variables, x, rng)  # (S,B,H,W,C)
        pred = jnp.argmax(jnp.mean(probs, axis=0), axis=-1)
        return dice_per_label(pred, s_sel, cfg.nlabels)

    images = data.test.images
    labels = data.test.labels
    n = images.shape[0] if max_images is None else min(max_images, images.shape[0])
    rng = jax.random.PRNGKey(cfg.seed + 101)
    host_rng = np.random.RandomState(cfg.seed)

    from phiseg_tpu.engine.validation import pad_to_batch

    dice_list = []
    t0 = time.time()
    for b0 in range(0, n, batch):
        b1 = min(b0 + batch, n)
        n_real = b1 - b0
        x = np.asarray(images[b0:b1]).astype(np.float32)[..., None]
        ann = np.asarray(labels[b0:b1]).astype(np.int32)  # (B,H,W,M)
        # score against a random annotator (ref scores against the loader's
        # random-annotator batch, :42-50)
        picks = host_rng.choice(list(cfg.annotator_range), size=n_real)
        s_sel = np.stack([ann[i, :, :, a] for i, a in enumerate(picks)], 0)
        x, s_sel = pad_to_batch(x, batch), pad_to_batch(s_sel, batch)
        d = predict_and_score(jnp.asarray(x), jnp.asarray(s_sel),
                              jax.random.fold_in(rng, b0))
        dice_list.append(np.asarray(d)[:n_real])
        log.info("%d/%d images (%.2f s/img)", b1, n, (time.time() - t0) / b1)

    dice_arr = np.concatenate(dice_list, 0)  # (N, nlabels)
    fg = dice_arr[:, 1:]
    log.info("-- mean foreground Dice: %.4f +- %.4f", fg.mean(), fg.std())

    np.savez(os.path.join(log_dir, f"dice_{tag}.npz"), dice_arr)
    return dice_arr


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("log_dir")
    p.add_argument("--samples", type=int, default=100)
    p.add_argument("--tag", default="best_dice")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--mesh", action="store_true",
                   help="shard the sample axis over all local devices")
    p.add_argument("--synth-n-test", type=int, default=None,
                   help="enlarge the synthetic test split for this eval")
    a = p.parse_args(argv)
    from phiseg_tpu.utils.tpu_lock import TpuLock

    with TpuLock(f"eval:pred:{os.path.basename(a.log_dir.rstrip('/'))}"):
        evaluate(a.log_dir, a.samples, a.tag, a.batch, a.max_images,
                 mesh=a.mesh, synth_n_test=a.synth_n_test)


if __name__ == "__main__":
    main()
