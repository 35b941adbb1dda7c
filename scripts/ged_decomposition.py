"""GED^2 term decomposition across trained families: WHY a model wins/loses.

GED^2 = 2*d_sy - d_ss - d_yy  (reference estimator, utils.py:294-322). The
combined number hides the mechanism: a model can lose GED by fitting worse
(high d_sy), by sampling too little diversity (d_ss << d_yy), or too much
(d_ss >> d_yy). Perfectly calibrated uncertainty has d_ss == d_yy == d_sy.

For each given log dir this restores the `best_ged` checkpoint, draws N
prior samples per test image (the phiseg_test_quantitative protocol,
ref :47-54) and prints the per-image-mean terms plus the diversity
calibration ratio d_ss/d_yy. Used for the round-3 multi-scale-ambiguity
analysis in RESULTS.md.

NOTE: cli.test_quantitative now embeds the same decomposition in every
ged npz it writes (keys d_sy/d_ss/d_yy alongside arr_0), so fresh evals
get this for free; this standalone script is for checkpoints whose npz
predate that, or for ad-hoc sample counts without rewriting artifacts.

Usage:
  python scripts/ged_decomposition.py LOGDIR [LOGDIR ...] \
      [--samples 50] [--batch 8] [--synth-n-test N] [--json OUT.json]
"""

from __future__ import annotations

import argparse
import json
import logging
import time

log = logging.getLogger(__name__)


def make_terms_fn(model, cfg, num_samples: int):
    import jax
    import jax.numpy as jnp

    from phiseg_tpu.metrics import ged_terms
    from phiseg_tpu.models.segvae import aggregate_levels

    nlabels = cfg.nlabels
    label_range = tuple(range(1, nlabels))

    @jax.jit
    def terms(variables, x, s_annotators, rng):
        cache = model.apply(variables, x, method="sample_cache")
        keys = jax.random.split(rng, num_samples)

        def draw(k):
            return jnp.argmax(
                aggregate_levels(model.apply(variables, cache, k, method="decode_sample")),
                axis=-1,
            )

        masks = jax.vmap(draw)(keys)  # (S,B,H,W)
        masks_b = jnp.moveaxis(masks, 0, 1)  # (B,S,H,W)
        return jax.vmap(
            lambda sm, gt: jnp.stack(
                ged_terms(sm, gt, nlabels=nlabels - 1, label_range=label_range)
            )
        )(masks_b, s_annotators)  # (B, 3)

    return terms


def decompose(log_dir: str, num_samples: int, batch: int,
              synth_n_test: int | None, max_images: int | None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from phiseg_tpu.data import get_dataset
    from phiseg_tpu.engine.loading import load_experiment
    from phiseg_tpu.engine.validation import pad_to_batch

    cfg, model, state, step = load_experiment(log_dir, "best_ged")
    if synth_n_test is not None:
        cfg = cfg.replace(synth_n_test=synth_n_test)
    data = get_dataset(cfg)
    fn = make_terms_fn(model, cfg, num_samples)

    images, labels = data.test.images, data.test.labels
    n = images.shape[0] if max_images is None else min(max_images, images.shape[0])
    rng = jax.random.PRNGKey(cfg.seed + 99)
    rows = []
    t0 = time.time()
    for b0 in range(0, n, batch):
        b1 = min(b0 + batch, n)
        x = np.asarray(images[b0:b1]).astype(np.float32)[..., None]
        ann = np.transpose(np.asarray(labels[b0:b1]).astype(np.int32), (0, 3, 1, 2))
        x, ann = (pad_to_batch(a, batch) for a in (x, ann))
        out = np.asarray(fn(state.variables, jnp.asarray(x), jnp.asarray(ann),
                            jax.random.fold_in(rng, b0)))
        rows.append(out[: b1 - b0])
    terms = np.concatenate(rows, axis=0)  # (n, 3): d_sy, d_ss, d_yy
    d_sy, d_ss, d_yy = terms.mean(axis=0)
    ged = float((2 * terms[:, 0] - terms[:, 1] - terms[:, 2]).mean())
    log.info("%s: %d imgs in %.1fs", log_dir, n, time.time() - t0)
    return {
        "log_dir": log_dir,
        "step": int(step),
        "n_images": int(n),
        "samples": num_samples,
        "ged2": ged,
        "d_sy_fit": float(d_sy),
        "d_ss_sample_diversity": float(d_ss),
        "d_yy_annotator_diversity": float(d_yy),
        "diversity_ratio_ss_over_yy": float(d_ss / d_yy) if d_yy else None,
    }


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("log_dirs", nargs="+")
    p.add_argument("--samples", type=int, default=50)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--synth-n-test", type=int, default=None)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--json", default=None, help="also dump results to this file")
    a = p.parse_args(argv)

    from phiseg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    results = [
        decompose(d, a.samples, a.batch, a.synth_n_test, a.max_images)
        for d in a.log_dirs
    ]
    hdr = (f"{'experiment':34s} {'GED^2':>7s} {'d_sy':>7s} {'d_ss':>7s} "
           f"{'d_yy':>7s} {'ss/yy':>6s}")
    print(hdr)
    for r in results:
        name = r["log_dir"].rstrip("/").split("/")[-1]
        print(f"{name:34s} {r['ged2']:7.4f} {r['d_sy_fit']:7.4f} "
              f"{r['d_ss_sample_diversity']:7.4f} "
              f"{r['d_yy_annotator_diversity']:7.4f} "
              f"{r['diversity_ratio_ss_over_yy']:6.3f}")
    if a.json:
        with open(a.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
