"""A/B the train-step structure on real TPU: fused aug vs two programs.

Usage: python scripts/ab_step.py [fused|legacy|plain|all]
"""

from __future__ import annotations

import sys
import time


def main(which="all"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from phiseg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from phiseg_tpu.data.augment_device import make_augment_fn
    from phiseg_tpu.data.synthetic import make_synthetic_arrays
    from phiseg_tpu.engine import build_model, create_train_state, make_train_step
    from phiseg_tpu.engine.train import make_optimizer
    from phiseg_tpu.experiments import get_experiment

    cfg = get_experiment("phiseg_7_5_synth").replace(compute_dtype="bfloat16")
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    rng = jax.random.PRNGKey(0)
    x_np, y_np = make_synthetic_arrays(cfg.batch_size, cfg.image_hw,
                                       cfg.num_labels_per_subject, seed=0)
    x = jnp.asarray(x_np)[..., None]
    s = jnp.asarray(y_np[..., 0].astype(np.int32))
    aug = make_augment_fn(cfg.augmentation_options, cfg.nlabels)

    def timed(tag, step, fold_host):
        state = create_train_state(model, cfg, rng, tx)
        st = [state]

        def run(i):
            key = jax.random.fold_in(rng, i) if fold_host else rng
            st[0], loss = step(st[0], x, s, key)
            return loss["total_loss"]

        for i in range(3):
            out = run(i)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        n = 30
        for i in range(n):
            out = run(3 + i)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) * 1000 / n
        print(f"{tag:28s}: {ms:7.2f} ms/step = {1000 * cfg.batch_size / ms:6.1f} img/s",
              flush=True)

    if which in ("fused", "all"):
        step = make_train_step(model, cfg, tx, augment_fn=aug,
                               fuse_aug=True, fold_by_step=True)
        timed("fused aug + in-step fold", step, fold_host=False)
    if which in ("legacy", "all"):
        step = make_train_step(model, cfg, tx, augment_fn=aug, fuse_aug=False)
        timed("2-program aug + host fold", step, fold_host=True)
    if which in ("plain", "all"):
        step = make_train_step(model, cfg, tx, augment_fn=None,
                               fold_by_step=True)
        timed("no aug (step only)", step, fold_host=False)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
