"""Perf lab: dissect the train step and the 100-sample sampler on real TPU.

Experiments (each prints one labelled line; run on the real chip):
  step-variants  -- step-only vs aug-only vs aug+step alternation (the
                    round-1 mystery: aug costs 0.3 ms alone but the
                    alternating pair runs ~15 ms slower than step-only),
                    plus a fused aug-in-step variant for comparison.
  batch-sweep    -- throughput at batch 12 / 24 / 48 (scaling headroom).
  sampler        -- single-image 100-sample decode: device time, synced
                    time, XLA FLOPs and implied MFU.

Usage: python scripts/perf_lab.py [step-variants|batch-sweep|sampler|all]
"""

from __future__ import annotations

import statistics
import sys
import time


def _setup(batch=None, dtype="bfloat16", norm=None, n0=None):
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

    cfg = get_experiment("phiseg_7_5_synth").replace(compute_dtype=dtype)
    if batch:
        cfg = cfg.replace(batch_size=batch)
    if norm:
        cfg = cfg.replace(norm=norm)
    if n0:
        cfg = cfg.replace(n0=n0)
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, rng, tx)
    x_np, y_np = make_synthetic_arrays(cfg.batch_size, cfg.image_hw,
                                       cfg.num_labels_per_subject, seed=0)
    x = jnp.asarray(x_np)[..., None]
    s = jnp.asarray(y_np[..., 0].astype(np.int32))
    aug = make_augment_fn(cfg.augmentation_options, cfg.nlabels)
    return cfg, model, tx, state, x, s, rng, aug


def _time_loop(fn, n=30, warmup=3, sync=None):
    import jax

    out = None
    for i in range(warmup):
        out = fn(i)
    jax.block_until_ready(out if sync is None else sync(out))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(warmup + i)
    jax.block_until_ready(out if sync is None else sync(out))
    return (time.perf_counter() - t0) * 1000 / n


def step_variants():
    import jax

    from phiseg_tpu.engine.train import make_train_step

    cfg, model, tx, state0, x, s, rng, aug = _setup()

    # (a) step only, no augmentation
    step_plain = make_train_step(model, cfg, tx, augment_fn=None)
    st = [state0]

    def run_plain(i):
        st[0], loss = step_plain(st[0], x, s, jax.random.fold_in(rng, i))
        return loss["total_loss"]

    ms_plain = _time_loop(run_plain)
    print(f"step-only            : {ms_plain:7.2f} ms/step")

    # (b) aug only
    aug_jit = jax.jit(aug)

    def run_aug(i):
        return aug_jit(x, s, jax.random.fold_in(rng, i))

    ms_aug = _time_loop(run_aug, sync=lambda o: o[0])
    print(f"aug-only             : {ms_aug:7.2f} ms/step")

    # (c) alternating two programs (round-1 production path)
    cfg2, model2, tx2, state2, *_ = _setup()
    step_pair = make_train_step(model2, cfg2, tx2, augment_fn=aug,
                                fuse_aug=False)
    st2 = [state2]

    def run_pair(i):
        st2[0], loss = step_pair(st2[0], x, s, jax.random.fold_in(rng, i))
        return loss["total_loss"]

    ms_pair = _time_loop(run_pair)
    print(f"aug+step (2 programs): {ms_pair:7.2f} ms/step  (overhead vs sum: "
          f"{ms_pair - ms_plain - ms_aug:+.2f} ms)")

    # (d) aug fused INTO the step program + in-step rng fold (production path)
    cfg3, model3, tx3, state3, *_ = _setup()
    step_fused = make_train_step(model3, cfg3, tx3, augment_fn=aug,
                                 fuse_aug=True, fold_by_step=True)
    st3 = [state3]

    def run_fused(i):
        st3[0], loss = step_fused(st3[0], x, s, rng)
        return loss["total_loss"]

    ms_fused = _time_loop(run_fused)
    print(f"aug fused in step    : {ms_fused:7.2f} ms/step")


def batch_sweep():
    import jax

    from phiseg_tpu.engine.train import make_train_step

    for b in (12, 24, 48):
        cfg, model, tx, state, x, s, rng, aug = _setup(batch=b)
        step = make_train_step(model, cfg, tx, augment_fn=aug)
        st = [state]

        def run(i):
            st[0], loss = step(st[0], x, s, jax.random.fold_in(rng, i))
            return loss["total_loss"]

        ms = _time_loop(run, n=20)
        print(f"batch {b:3d}: {ms:7.2f} ms/step = {1000 * b / ms:7.1f} img/s")


def sampler():
    import jax

    from phiseg_tpu.engine.train import make_sample_fn

    cfg, model, tx, state, x, s, rng, aug = _setup()
    fn = make_sample_fn(model, 100)
    x1 = x[:1]
    variables = state.variables

    # XLA FLOP estimate
    try:
        ca = fn.lower(variables, x1, rng).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        flops = 0.0

    jax.block_until_ready(fn(variables, x1, rng))
    lat = []
    for i in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(variables, x1, jax.random.fold_in(rng, i)))
        lat.append((time.perf_counter() - t0) * 1000)
    synced = statistics.median(lat)

    reps = 20
    t0 = time.perf_counter()
    outs = [fn(variables, x1, jax.random.fold_in(rng, 100 + i)) for i in range(reps)]
    jax.block_until_ready(outs)
    device_ms = (time.perf_counter() - t0) * 1000 / reps

    mfu = flops / (device_ms / 1000) / 197e12 if flops else float("nan")
    print(f"sampler 100x1: device {device_ms:.2f} ms | synced p50 {synced:.2f} ms"
          f" | {flops / 1e9:.1f} GFLOP | MFU {100 * mfu:.1f}%")


def norm_sweep():
    """Full fused train step under each normalisation (VERDICT round-2 #2:
    BN f32 stat reductions are a large non-MXU slice of the step; GN is a
    legitimate parity variant the reference also ships,
    tfwrapper/normalisation.py:17-36; batch_bf16 keeps BN but accumulates
    stats in bf16)."""
    import jax

    from phiseg_tpu.engine.train import make_train_step

    for norm in ("batch", "batch_bf16", "group", "instance", "none"):
        cfg, model, tx, state, x, s, rng, aug = _setup(norm=norm)
        step = make_train_step(model, cfg, tx, augment_fn=aug,
                               fuse_aug=True, fold_by_step=True)
        st = [state]

        def run(i):
            st[0], loss = step(st[0], x, s, rng)
            return loss["total_loss"]

        ms = _time_loop(run, n=20)
        print(f"norm {norm:11s}: {ms:7.2f} ms/step = "
              f"{1000 * cfg.batch_size / ms:7.1f} img/s")


def layout_sweep():
    """Attack the 13.1 ms 'relayout-carrying conv fusion' bucket (VERDICT r3
    weak #1) with the levers actually available, measuring MFU per variant:

      * compute dtype f32 vs bf16 -- if the {3,2,1,0}<->{3,0,2,1} relayouts
        come from bf16 sublane packing (16-row tiles vs 8 for f32), f32
        should shrink that bucket (at 2x HBM);
      * batch 12 -> 24 -> 48 -- amortises per-step fixed relayout work;
      * channel width n0 32 -> 64 (diagnostic only, NOT parity: 4x FLOPs) --
        if MFU rises materially with wider channels, the low MFU is the
        reference's channel schedule under-filling the 128-lane MXU, which
        turns round 3's "architectural property" assertion into a measured
        result.

    Not swept, with reasons: conv dimension_numbers (flax nn.Conv is
    NHWC-only; XLA:TPU re-lays-out internally regardless), XLA layout flags
    (process-global at backend init, can't A/B within one process; and the
    tunnel makes multi-process compile sweeps ~7 min/variant).
    """
    import os

    import jax

    from phiseg_tpu.engine.train import make_train_step

    # Incremental + resumable: each variant line is appended to the artifact
    # the moment it is measured, and already-recorded variants are skipped on
    # relaunch, so a deadline kill mid-sweep preserves the completed rows
    # (every TPU compile here costs ~5-7 min through the tunnel).
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "layout_sweep.txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    recorded = open(out).read() if os.path.exists(out) else ""
    if not recorded:
        with open(out, "w") as f:
            f.write(layout_sweep.__doc__ + "\n")

    for label, kw in [
        ("bf16 b12 n0=32 (prod)", dict()),
        ("f32  b12 n0=32", dict(dtype="float32")),
        ("bf16 b24 n0=32", dict(batch=24)),
        ("bf16 b48 n0=32", dict(batch=48)),
        ("bf16 b12 n0=64 (diag)", dict(n0=64)),
    ]:
        if f"layout {label:22s}:" in recorded:
            print(f"layout {label}: already recorded, skipping", flush=True)
            continue
        cfg, model, tx, state, x, s, rng, aug = _setup(**kw)
        step = make_train_step(model, cfg, tx, augment_fn=aug,
                               fuse_aug=True, fold_by_step=True)
        try:
            ca = step.lower(state, x, s, rng).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
        except Exception:
            flops = 0.0
        st = [state]

        def run(i):
            st[0], loss = step(st[0], x, s, rng)
            return loss["total_loss"]

        ms = _time_loop(run, n=20)
        mfu = flops / (ms / 1000) / 197e12 if flops else float("nan")
        line = (f"layout {label:22s}: {ms:7.2f} ms/step = "
                f"{1000 * cfg.batch_size / ms:7.1f} img/s | "
                f"{flops / 1e9:6.1f} GFLOP | MFU {100 * mfu:5.1f}%")
        print(line, flush=True)
        with open(out, "a") as f:
            f.write(line + "\n")

    # Completion sentinel the chain's skip guard greps for -- a partial
    # (killed) sweep must NOT be mistaken for a finished one.
    if "SWEEP COMPLETE" not in (open(out).read() if os.path.exists(out) else ""):
        with open(out, "a") as f:
            f.write("SWEEP COMPLETE\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    from phiseg_tpu.utils.tpu_lock import TpuLock

    _lab_lock = TpuLock("perf-lab")
    _lab_lock.acquire()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("step-variants", "all"):
        step_variants()
    if which in ("batch-sweep", "all"):
        batch_sweep()
    if which in ("norm-sweep", "all"):
        norm_sweep()
    if which in ("layout-sweep",):
        layout_sweep()
    if which in ("sampler", "all"):
        sampler()
    _lab_lock.release()
