"""Train-step, schedule and sampling-engine tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phiseg_tpu.engine import (
    ExperimentConfig,
    build_model,
    create_train_state,
    make_eval_loss_fn,
    make_sample_fn,
    make_train_step,
)
from phiseg_tpu.engine.train import lr_schedule_from_dict, make_optimizer


def tiny_cfg(**kw):
    base = dict(model_family="phiseg", latent_levels=3, resolution_levels=5,
                n0=2, zdim0=2, image_size=(32, 32, 1), compute_dtype="float32",
                norm="none", batch_size=4)
    base.update(kw)
    return ExperimentConfig(**base)


def toy_batch(key, hw=32, b=4):
    x = jnp.tile(jnp.linspace(-1, 1, hw)[None, :, None, None], (b, 1, hw, 1)).reshape(b, hw, hw, 1)
    s = (x[..., 0] > 0).astype(jnp.int32)
    return x, s


def test_lr_schedule_floor_lookup():
    sched = lr_schedule_from_dict({0: 1e-3, 100: 1e-4, 500: 1e-5})
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(99)) == pytest.approx(1e-3)
    assert float(sched(100)) == pytest.approx(1e-4)
    assert float(sched(499)) == pytest.approx(1e-4)
    assert float(sched(10_000)) == pytest.approx(1e-5)


@pytest.mark.parametrize("fam,kl", [("phiseg", 1.0), ("prob_unet", 1.0), ("det_unet", None)])
def test_loss_decreases(fam, kl):
    cfg = tiny_cfg(model_family=fam, kl_divergence_loss_weight=kl)
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, key, tx)
    step = make_train_step(model, cfg, tx)
    x, s = toy_batch(key)
    losses = []
    for i in range(25):
        state, ld = step(state, x, s, jax.random.fold_in(key, i))
        losses.append(float(ld["total_loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 25


def test_loss_dict_keys_match_reference_names():
    cfg = tiny_cfg()
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, key, tx)
    evalf = make_eval_loss_fn(model, cfg)
    x, s = toy_batch(key)
    ld = evalf(state.variables, x, s, key)
    for i in range(3):
        assert f"residual_multinoulli_loss_lvl{i}" in ld
        assert f"KL_divergence_loss_lvl{i}" in ld
    assert "total_loss" in ld


def test_weight_decay_hookup():
    cfg = tiny_cfg(weight_decay_weight=1e-4)
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, key, tx)
    evalf = make_eval_loss_fn(model, cfg)
    x, s = toy_batch(key)
    ld = evalf(state.variables, x, s, key)
    assert "weight_decay" in ld and float(ld["weight_decay"]) > 0


def test_sample_fn_probabilities():
    cfg = tiny_cfg()
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, key, tx)
    x, _ = toy_batch(key)
    probs = make_sample_fn(model, 5)(state.variables, x, key)
    assert probs.shape == (5, 4, 32, 32, 2)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)
    assert not np.allclose(np.asarray(probs[0]), np.asarray(probs[1]))


def test_train_step_with_device_augmentation():
    from phiseg_tpu.data.augment_device import make_augment_fn

    cfg = tiny_cfg()
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, key, tx)
    aug = make_augment_fn({"do_fliplr": True, "do_rotations": True,
                           "augment_every_nth": 1}, nlabels=2)
    step = make_train_step(model, cfg, tx, augment_fn=aug)
    x, s = toy_batch(key)
    state, ld = step(state, x, s, key)
    assert np.isfinite(float(ld["total_loss"]))


def test_momentum_optimizer():
    cfg = tiny_cfg(optimizer="momentum", model_family="det_unet",
                   kl_divergence_loss_weight=None)
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, key, tx)
    step = make_train_step(model, cfg, tx)
    x, s = toy_batch(key)
    state, ld = step(state, x, s, key)
    assert np.isfinite(float(ld["total_loss"]))


def test_bad_optimizer_raises():
    with pytest.raises(ValueError):
        make_optimizer(tiny_cfg(optimizer="adagrad"))


def test_validation_elbo_multi_draw_protocol():
    """make_validation_fn averages validation_elbo_samples posterior draws
    (the reference's tile-x16 protocol, phiseg_model.py:577-585): the
    returned ELBO equals the mean of manually-computed per-draw ELBOs with
    the same key derivation."""
    from phiseg_tpu.engine.objective import phiseg_objective
    from phiseg_tpu.engine.validation import make_validation_fn
    from phiseg_tpu.nn.losses import one_hot

    cfg = tiny_cfg()
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, key, tx)
    x, s = toy_batch(key)
    ann = jnp.stack([s] * 4, axis=1)  # (B,M,H,W)
    rng = jax.random.PRNGKey(123)

    def manual_mean_elbo(n_draws):
        _, rng_elbo = jax.random.split(rng)
        s_oh = one_hot(s, cfg.nlabels)
        es = []
        for k in jax.random.split(rng_elbo, n_draws):
            outputs = model.apply(state.variables, x, s_oh, k, train=False)
            e, _ = phiseg_objective(outputs, s_oh, cfg,
                                    params=state.variables["params"])
            es.append(float(e))
        return float(np.mean(es))

    for n in (1, 4):
        vfn = make_validation_fn(model, cfg.replace(validation_elbo_samples=n,
                                                    validation_samples=2))
        got = float(vfn(state.variables, x, ann, s, rng)[3])
        np.testing.assert_allclose(got, manual_mean_elbo(n), rtol=2e-4)
    # and the two draw counts genuinely differ (distinct keys per draw)
    assert manual_mean_elbo(1) != manual_mean_elbo(4)
