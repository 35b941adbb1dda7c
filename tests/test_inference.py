"""InferenceEngine API surface tests (reference phiseg_model method parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phiseg_tpu.engine import ExperimentConfig, build_model, create_train_state
from phiseg_tpu.engine.inference import InferenceEngine
from phiseg_tpu.engine.train import make_optimizer


@pytest.fixture(scope="module")
def engine():
    cfg = ExperimentConfig(model_family="phiseg", latent_levels=2,
                           resolution_levels=4, n0=2, zdim0=2,
                           image_size=(16, 16, 1), compute_dtype="float32",
                           norm="none")
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), make_optimizer(cfg))
    return InferenceEngine(cfg, model, state)


@pytest.fixture(scope="module")
def xs():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 16, 16, 1))
    s = (jax.random.uniform(key, (2, 16, 16)) > 0.5).astype(jnp.int32)
    return x, s


def test_predict(engine, xs):
    x, _ = xs
    pred = engine.predict(x, jax.random.PRNGKey(0), num_samples=4)
    assert pred.shape == (2, 16, 16)
    pred2, sm = engine.predict(x, jax.random.PRNGKey(0), num_samples=4,
                               return_softmax=True)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(pred2))
    np.testing.assert_allclose(np.asarray(sm.sum(-1)), 1.0, rtol=1e-5)


def test_single_sample_and_levels(engine, xs):
    x, _ = xs
    m = engine.predict_segmentation_sample(x, jax.random.PRNGKey(2))
    assert m.shape == (2, 16, 16)
    levels = engine.predict_segmentation_sample_levels(x, jax.random.PRNGKey(2))
    assert len(levels) == 2
    assert levels[0].shape == (2, 16, 16, 2)


def test_variance_and_error_maps(engine, xs):
    x, s = xs
    v = engine.sample_variance_map(x, jax.random.PRNGKey(3), num_samples=4)
    assert v.shape == (2, 16, 16) and float(v.min()) >= 0
    e = engine.crossentropy_error_map(x, s, jax.random.PRNGKey(3), num_samples=4)
    assert e.shape == (2, 16, 16) and float(e.min()) >= 0
    means, vars_, errs = engine.mean_variance_and_error_maps(
        x, s, jax.random.PRNGKey(3), num_samples=4)
    assert means.shape == vars_.shape == errs.shape == (2, 16, 16)


def test_latent_roundtrip(engine, xs):
    """prior z -> decode_z must equal the cache-based sampling given same z."""
    x, s = xs
    z = engine.generate_prior_samples(x, jax.random.PRNGKey(4))
    assert len(z) == 2
    out = engine.generate_samples_from_z(z, x)
    assert out.shape == (2, 16, 16, 2)
    levels = engine.generate_samples_from_z(z, x, output_all_levels=True)
    assert len(levels) == 2

    zq, mu, sigma = engine.generate_posterior_samples(x, s, jax.random.PRNGKey(5),
                                                      return_params=True)
    assert len(zq) == 2 and mu[0].shape == zq[0].shape


def test_from_logdir(tmp_path, xs):
    from phiseg_tpu.engine.checkpoint import CheckpointManager

    cfg = ExperimentConfig(model_family="det_unet", latent_levels=1,
                           resolution_levels=4, n0=2, image_size=(16, 16, 1),
                           compute_dtype="float32", norm="none",
                           kl_divergence_loss_weight=None)
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), make_optimizer(cfg))
    cfg.save(str(tmp_path / "config.json"))
    CheckpointManager(str(tmp_path)).save(state, "latest", step=0)
    eng = InferenceEngine.from_logdir(str(tmp_path))
    x, _ = xs
    assert eng.predict(x, jax.random.PRNGKey(0), num_samples=1).shape == (2, 16, 16)
