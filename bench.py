"""Benchmark: PHiSeg 7/5 training throughput + 100-sample inference latency.

Prints ONE JSON line:
  {"metric": ..., "value": images/sec/chip, "unit": "images/sec", "vs_baseline": ...}

Headline metric: training images/sec/chip on the flagship `phiseg_7_5`
config (128x128 LIDC-shaped data, full R=7/L=5 hierarchy, batch-norm,
Adam, bf16 compute path) including on-device augmentation -- i.e. the real
end-to-end train step, not a stripped kernel.

Baseline: the reference (TF 1.12, feed_dict, single GPU) publishes no
throughput numbers (BASELINE.md). We use an assumed 60 images/sec for the
TF1 reference train step on a modern GPU at batch 12 (feed_dict-driven TF1
conv nets of this size typically run 3-6 steps/sec); vs_baseline =
ours / 60. The driver's north star is >= 5x.

Also measured and reported in "extra": p50 latency of a 100-sample prior
draw for ONE image (the phiseg_test_quantitative inner loop; north star
< 50 ms on v5e).
"""

from __future__ import annotations

import argparse
import json
import statistics
import time

ASSUMED_TF1_IMAGES_PER_SEC = 60.0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="fewer timing iterations")
    p.add_argument("--batch", type=int, default=None, help="override batch size")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--tiny", action="store_true",
                   help="shrunk model for CPU smoke tests of the bench itself")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from phiseg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from phiseg_tpu.data.augment_device import make_augment_fn
    from phiseg_tpu.data.synthetic import make_synthetic_arrays
    from phiseg_tpu.engine import build_model, create_train_state, make_train_step
    from phiseg_tpu.engine.train import make_optimizer, make_sample_fn
    from phiseg_tpu.experiments import get_experiment

    cfg = get_experiment("phiseg_7_5_synth").replace(compute_dtype=args.dtype)
    if args.tiny:
        cfg = cfg.replace(n0=2, image_size=(64, 64, 1), batch_size=2,
                          compute_dtype="float32")
    if args.batch:
        cfg = cfg.replace(batch_size=args.batch)

    steps = 10 if args.quick else 30
    warmup = 3
    if args.tiny:
        steps, warmup = 2, 1

    model = build_model(cfg)
    tx = make_optimizer(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, rng, tx)
    aug = make_augment_fn(cfg.augmentation_options, cfg.nlabels)
    step_fn = make_train_step(model, cfg, tx, augment_fn=aug)

    hw = cfg.image_hw
    x_np, y_np = make_synthetic_arrays(cfg.batch_size, hw, cfg.num_labels_per_subject, seed=0)
    x = jnp.asarray(x_np)[..., None]
    s = jnp.asarray(y_np[..., 0].astype(np.int32))

    # training throughput
    for i in range(warmup):
        state, loss = step_fn(state, x, s, jax.random.fold_in(rng, i))
    jax.block_until_ready(loss["total_loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, loss = step_fn(state, x, s, jax.random.fold_in(rng, warmup + i))
    jax.block_until_ready(loss["total_loss"])
    dt = time.perf_counter() - t0
    images_per_sec = cfg.batch_size * steps / dt

    # 100-sample inference: single-image synced latency AND batched eval
    # throughput (the quantitative-eval workload processes image batches).
    sampler = make_sample_fn(model, 100)
    x1 = x[:1]
    probs = sampler(state.variables, x1, rng)  # compile
    jax.block_until_ready(probs)
    lat = []
    for i in range(5 if args.quick else 10):
        t0 = time.perf_counter()
        probs = sampler(state.variables, x1, jax.random.fold_in(rng, 1000 + i))
        jax.block_until_ready(probs)
        lat.append((time.perf_counter() - t0) * 1000)
    p50_ms = statistics.median(lat)

    xb = x[: min(8, cfg.batch_size)]
    probs = sampler(state.variables, xb, rng)
    jax.block_until_ready(probs)
    reps = 3 if args.quick else 5
    t0 = time.perf_counter()
    for i in range(reps):
        probs = sampler(state.variables, xb, jax.random.fold_in(rng, 2000 + i))
    jax.block_until_ready(probs)
    batched_ms_per_img = (time.perf_counter() - t0) * 1000 / reps / xb.shape[0]

    result = {
        "metric": "phiseg_7_5 train throughput (128x128, batch %d, %s, on-device aug)"
        % (cfg.batch_size, args.dtype),
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / ASSUMED_TF1_IMAGES_PER_SEC, 2),
        "extra": {
            "sample100_p50_ms_per_image": round(p50_ms, 2),
            "sample100_ms_per_image_batched": round(batched_ms_per_img, 2),
            "step_ms": round(1000 * dt / steps, 2),
            "device": str(jax.devices()[0]),
            "assumed_tf1_baseline_images_per_sec": ASSUMED_TF1_IMAGES_PER_SEC,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
